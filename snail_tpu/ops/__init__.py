from .intersect import intersect_tris, intersect_brute_force, intersect_any_brute_force
from .traverse_ref import traverse_bvh_ref, traverse_bvh_shadow_ref

__all__ = [
    "intersect_tris",
    "intersect_brute_force",
    "intersect_any_brute_force",
    "traverse_bvh_ref",
    "traverse_bvh_shadow_ref",
]
