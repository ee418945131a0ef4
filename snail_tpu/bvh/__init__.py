from .build import BVH, build_bvh
from .cache import save_bvh, load_bvh, build_or_load

__all__ = ["BVH", "build_bvh", "save_bvh", "load_bvh", "build_or_load"]
