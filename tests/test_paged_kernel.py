"""Paged (two-level) Pallas traversal vs the flat kernels.

Runs the interpret path on a small scene with artificially tiny pages
(page_cap=16) so every packet takes multiple page faults; results must be
identical to the single-level kernels bit-for-bit (same arithmetic, same
traversal order up to box culls).
"""

import dataclasses

import numpy as np
import pytest


@pytest.fixture(scope="module")
def scenes():
    import jax.numpy as jnp

    from snail_tpu.bvh import build_bvh
    from snail_tpu.bvh.pages import partition_pages
    from snail_tpu.core.types import Camera, Light
    from snail_tpu.scene.procedural import cornell_scene
    from snail_tpu.scene.scene import make_traced_scene

    base = cornell_scene()
    g = base.flatten()
    lo, hi = g.bounds()
    bvh = build_bvh(lo, hi, leaf_size=8)
    lights = Light.make((0.0, 3.5, 0.0), (1.0, 0.9, 0.8), 30.0)
    flat = make_traced_scene(g, bvh, lights=lights)
    assert flat.pg_meta is None

    from snail_tpu.ops.traverse_pallas import page_kernel_layout

    layout = partition_pages(bvh, page_cap=4)
    assert layout.n_pages > 1
    pm, pb = page_kernel_layout(layout.pg_meta, layout.pg_box)
    paged = dataclasses.replace(
        flat,
        pk_meta=jnp.asarray(layout.top_meta),
        pk_box=jnp.asarray(layout.top_box),
        pg_meta=jnp.asarray(pm),
        pg_box=jnp.asarray(pb),
    )
    cam = Camera.look_at(pos=(0.0, 2.0, 6.0), target=(0.0, 1.5, 0.0))
    return flat, paged, cam, lights


def test_paged_camera_matches_flat(scenes):
    from snail_tpu.ops.traverse_pallas import camera_trace

    flat, paged, cam, _ = scenes
    a = [np.asarray(x) for x in camera_trace(flat, cam, 64, 64)]
    b = [np.asarray(x) for x in camera_trace(paged, cam, 64, 64)]
    np.testing.assert_array_equal(a[3], b[3])  # tri ids
    for i in (0, 1, 2):
        np.testing.assert_allclose(a[i], b[i], atol=1e-6)


def test_paged_shadow_matches_flat(scenes):
    import jax.numpy as jnp

    from snail_tpu.core.vecmath import BIG
    from snail_tpu.ops.traverse_pallas import any_hit_shared, camera_trace

    flat, paged, cam, lights = scenes
    dist, u, v, tri, dx, dy, dz = camera_trace(flat, cam, 64, 64)
    lp = lights.pos[0]
    hit = (dist > 0) & (dist < BIG)
    px = cam.pos[0] + dx * dist
    py = cam.pos[1] + dy * dist
    pz = cam.pos[2] + dz * dist
    lv = (px - lp[0], py - lp[1], pz - lp[2])
    ld = jnp.sqrt(lv[0] ** 2 + lv[1] ** 2 + lv[2] ** 2)
    sd = tuple(jnp.where(hit, c / ld, 0.5774) for c in lv)
    stm = jnp.where(hit, ld * 0.9999, -BIG)

    a = np.asarray(any_hit_shared(flat, lp, sd, stm))
    b = np.asarray(any_hit_shared(paged, lp, sd, stm))
    np.testing.assert_array_equal(a, b)
