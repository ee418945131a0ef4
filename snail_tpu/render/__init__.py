from .raygen import primary_rays, tile_rays, untile_image, TILE_W, TILE_H
from .integrator import render_wavefront, shade_hits, trace_light
from .renderer import Renderer

__all__ = [
    "primary_rays",
    "tile_rays",
    "untile_image",
    "TILE_W",
    "TILE_H",
    "render_wavefront",
    "shade_hits",
    "trace_light",
    "Renderer",
]
