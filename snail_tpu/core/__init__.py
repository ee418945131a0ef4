from .vecmath import (
    dot,
    cross,
    length,
    normalize,
    safe_inv,
    reflect,
    refract,
)
from .types import Rays, Hit, Camera, Light, RenderOpts

__all__ = [
    "dot",
    "cross",
    "length",
    "normalize",
    "safe_inv",
    "reflect",
    "refract",
    "Rays",
    "Hit",
    "Camera",
    "Light",
    "RenderOpts",
]
