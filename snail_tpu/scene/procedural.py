"""Procedural test scenes (no file IO).

The reference ships .obj files (scenes/readme.txt) and its tests rely on
rendering them; these generators provide self-contained equivalents for
tests, benchmarks and the driver entry points so nothing depends on a
mounted asset directory.
"""

from __future__ import annotations

import numpy as np

from .base_scene import BaseScene, SceneObject


def _obj_from_tris(tri: np.ndarray, mat: int = 0) -> SceneObject:
    """SceneObject from a [N, 3, 3] float32 triangle soup (flat normals)."""
    n = tri.shape[0]
    return SceneObject(
        verts=tri.reshape(-1, 3).astype(np.float32),
        uvs=np.zeros((0, 2), np.float32),
        normals=np.zeros((0, 3), np.float32),
        tri_v=np.arange(n * 3, dtype=np.int32).reshape(n, 3),
        tri_vt=np.full((n, 3), -1, np.int32),
        tri_vn=np.full((n, 3), -1, np.int32),
        tri_mat=np.full(n, mat, np.int32),
    )


def _quad(a, b, c, d):
    """Two triangles for quad a-b-c-d (counter-clockwise)."""
    return np.asarray([[a, b, c], [a, c, d]], np.float32)


def box_tris(lo=(-1, -1, -1), hi=(1, 1, 1)) -> np.ndarray:
    """12 triangles of an axis-aligned box (the box.obj shape)."""
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    p = lambda x, y, z: (x, y, z)
    quads = [
        _quad(p(x0, y0, z0), p(x1, y0, z0), p(x1, y1, z0), p(x0, y1, z0)),
        _quad(p(x1, y0, z1), p(x0, y0, z1), p(x0, y1, z1), p(x1, y1, z1)),
        _quad(p(x0, y0, z1), p(x0, y0, z0), p(x0, y1, z0), p(x0, y1, z1)),
        _quad(p(x1, y0, z0), p(x1, y0, z1), p(x1, y1, z1), p(x1, y1, z0)),
        _quad(p(x0, y1, z0), p(x1, y1, z0), p(x1, y1, z1), p(x0, y1, z1)),
        _quad(p(x0, y0, z1), p(x1, y0, z1), p(x1, y0, z0), p(x0, y0, z0)),
    ]
    return np.concatenate(quads, axis=0)


def box_scene() -> BaseScene:
    """A single box — the box.obj test scene equivalent."""
    s = BaseScene()
    s.objects.append(_obj_from_tris(box_tris()))
    s.gen_normals()
    return s


def cornell_scene() -> BaseScene:
    """Open box room + two inner boxes; exercises shadows + reflections."""
    s = BaseScene()
    room = []
    # floor, back wall, left, right, ceiling
    room.append(_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)))
    room.append(_quad((-2, 0, -2), (-2, 4, -2), (2, 4, -2), (2, 0, -2)))
    room.append(_quad((-2, 0, -2), (-2, 0, 2), (-2, 4, 2), (-2, 4, -2)))
    room.append(_quad((2, 0, -2), (2, 4, -2), (2, 4, 2), (2, 0, 2)))
    room.append(_quad((-2, 4, -2), (-2, 4, 2), (2, 4, 2), (2, 4, -2)))
    s.objects.append(_obj_from_tris(np.concatenate(room, axis=0), mat=0))
    s.objects.append(
        _obj_from_tris(box_tris((-1.2, 0.0, -1.2), (-0.2, 2.0, -0.2)), mat=0)
    )
    s.objects.append(
        _obj_from_tris(box_tris((0.3, 0.0, 0.2), (1.3, 1.0, 1.2)), mat=0)
    )
    s.gen_normals()
    return s


def soup_scene(n: int = 1000, spread: float = 5.0, size: float = 0.6,
               seed: int = 0) -> BaseScene:
    """Random triangle soup — the incoherent-ray stress scene."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (n, 1, 3))
    tri = (base + rng.uniform(-size, size, (n, 3, 3))).astype(np.float32)
    s = BaseScene()
    s.objects.append(_obj_from_tris(tri))
    s.gen_normals()
    return s


def city_scene(grid: int = 24, seed: int = 0) -> BaseScene:
    """A grid of boxes of varying heights on a ground plane — a
    sponza-like benchmark stand-in (occlusion + shadow heavy) with
    ~``12*grid^2`` triangles."""
    rng = np.random.default_rng(seed)
    tris = [
        _quad(
            (-grid, 0, -grid), (grid, 0, -grid),
            (grid, 0, grid), (-grid, 0, grid),
        )
    ]
    for i in range(grid):
        for j in range(grid):
            if rng.uniform() < 0.3:
                continue
            x = (i - grid / 2) * 2.0 + rng.uniform(0.1, 0.4)
            z = (j - grid / 2) * 2.0 + rng.uniform(0.1, 0.4)
            w = rng.uniform(0.5, 1.4)
            h = rng.uniform(0.5, 6.0)
            tris.append(box_tris((x, 0, z), (x + w, h, z + w)))
    s = BaseScene()
    s.objects.append(_obj_from_tris(np.concatenate(tris, axis=0)))
    s.gen_normals()
    return s
