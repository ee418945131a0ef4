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

    from snail_tpu.ops.traverse_pallas import (
        build_mask_boxv, page_kernel_layout,
    )

    layout = partition_pages(bvh, page_cap=4)
    assert layout.n_pages > 1
    pm, pb = page_kernel_layout(layout.pg_meta, layout.pg_box)
    mk_boxv, mk_off = build_mask_boxv(layout.top_box, pb, layout.page_cap)
    paged = dataclasses.replace(
        flat,
        pk_meta=jnp.asarray(layout.top_meta),
        pk_box=jnp.asarray(layout.top_box),
        pg_meta=jnp.asarray(pm),
        pg_box=jnp.asarray(pb),
        mk_boxv=jnp.asarray(mk_boxv),
        mk_off=mk_off,
        mk_cap=layout.page_cap,
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


def test_paged_general_closest_matches_flat(scenes):
    """Per-ray-origin (bounce) closest hit through the paged general
    interval kernel vs the flat scene — the reference traces secondary
    rays through the same BVH at any scene size (scene_inl.h:434-458)."""
    import jax.numpy as jnp

    from snail_tpu.core.vecmath import BIG
    from snail_tpu.ops.traverse_pallas import closest_hit_c

    flat, paged, cam, _ = scenes
    rng = np.random.default_rng(7)
    n = 500
    o = rng.uniform(-1.5, 1.5, (3, n)).astype(np.float32)
    d = rng.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    tm = np.full(n, BIG, np.float32)
    tm[:25] = -BIG  # masked rays
    o3 = tuple(jnp.asarray(c) for c in o)
    d3 = tuple(jnp.asarray(c) for c in d)
    tmj = jnp.asarray(tm)

    fa = [np.asarray(x) for x in closest_hit_c(flat, o3, d3, tmj)]
    pa = [np.asarray(x) for x in closest_hit_c(paged, o3, d3, tmj)]
    hit = (fa[0] > 0) & (fa[0] < BIG)
    # tri ids may differ only where two triangles tie on distance (the
    # flat worklist kernels and the paged walk process leaves in a
    # different order, and equal-distance hits keep the first winner —
    # the reference's traversal order-dependence, bvh/traverse.cpp)
    differ = hit & (fa[3] != pa[3])
    np.testing.assert_allclose(fa[0][differ], pa[0][differ], rtol=1e-6)
    np.testing.assert_allclose(fa[0][hit], pa[0][hit], atol=1e-5)
    same = hit & (fa[3] == pa[3])
    for i in range(1, 3):
        np.testing.assert_allclose(fa[i][same], pa[i][same], atol=1e-5)
    # miss/masked sentinels agree
    np.testing.assert_allclose(fa[0], pa[0], atol=1e-5)


def test_paged_general_any_hit_matches_flat(scenes):
    import jax.numpy as jnp

    from snail_tpu.core.vecmath import BIG
    from snail_tpu.ops.traverse_pallas import any_hit_c

    flat, paged, _, lights = scenes
    rng = np.random.default_rng(11)
    n = 400
    o = rng.uniform(-1.5, 1.5, (3, n)).astype(np.float32)
    d = rng.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    tm = rng.uniform(0.5, 8.0, n).astype(np.float32)
    tm[:20] = -BIG
    o3 = tuple(jnp.asarray(c) for c in o)
    d3 = tuple(jnp.asarray(c) for c in d)
    a = np.asarray(any_hit_c(flat, o3, d3, jnp.asarray(tm)))
    b = np.asarray(any_hit_c(paged, o3, d3, jnp.asarray(tm)))
    np.testing.assert_array_equal(a, b)


def test_paged_render_default_opts(scenes):
    """render_frame_fast on a paged scene with DEFAULT RenderOpts
    (reflections on -> bounce rays through the paged general kernel);
    round 3 crashed here with 'single-level only'."""
    from snail_tpu.core.types import RenderOpts
    from snail_tpu.render.fast import render_frame_fast

    flat, paged, cam, _ = scenes
    a = np.asarray(render_frame_fast(flat, cam, 64, 64, RenderOpts()))
    b = np.asarray(render_frame_fast(paged, cam, 64, 64, RenderOpts()))
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a, b, atol=1e-4)
