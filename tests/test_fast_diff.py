"""Differentiable fast path (render/fast.py::render_frame_fast_diff).

Checks, on the CPU interpret path (same kernels the TPU runs):
1. forward parity with render_frame_fast (same traversal, recomputed
   continuous outputs);
2. gradient parity with the portable differentiable integrator
   (render_wavefront over the jnp reference traversal) — both use the
   stop-gradient-topology + closed-form-recompute design
   (snail_tpu/diff/vjp.py), so grads w.r.t. vertices and materials must
   agree wherever both paths find the same hits.
"""

import dataclasses

import numpy as np
import pytest


def _scene():
    from snail_tpu.bvh import build_bvh
    from snail_tpu.core.types import Light
    from snail_tpu.scene.procedural import cornell_scene
    from snail_tpu.scene.scene import make_traced_scene

    base = cornell_scene()
    g = base.flatten()
    lo, hi = g.bounds()
    bvh = build_bvh(lo, hi, leaf_size=8)
    lights = Light.make((0.0, 3.5, 0.0), (1.0, 0.9, 0.8), 30.0)
    return make_traced_scene(g, bvh, lights=lights)


@pytest.fixture(scope="module")
def setup():
    from snail_tpu.core.types import Camera, RenderOpts

    scene = _scene()
    cam = Camera.look_at(pos=(0.0, 2.0, 6.0), target=(0.0, 1.5, 0.0))
    opts = RenderOpts(reflections=False, transparency=False, textures=False)
    return scene, cam, opts


def test_forward_matches_fast(setup):
    from snail_tpu.render.fast import render_frame_fast, render_frame_fast_diff

    scene, cam, opts = setup
    a = np.asarray(render_frame_fast(scene, cam, 64, 64, opts))
    b = np.asarray(render_frame_fast_diff(scene, cam, 64, 64, opts))
    assert np.allclose(a, b, atol=2e-5), np.abs(a - b).max()


def test_grads_match_portable(setup):
    import jax
    import jax.numpy as jnp

    from snail_tpu.core.vecmath import BIG
    from snail_tpu.render.fast import render_frame_fast_diff
    from snail_tpu.render.integrator import render_wavefront
    from snail_tpu.render.raygen import primary_rays, tile_rays, untile_image

    scene, cam, opts = setup
    w = h = 64
    params = {"tri_a": scene.tri_a, "mat_diffuse": scene.mat_diffuse}

    def loss_fast(params):
        s = dataclasses.replace(scene, **params)
        img = render_frame_fast_diff(s, cam, w, h, opts)
        return jnp.mean(img * img)

    def loss_portable(params):
        s = dataclasses.replace(scene, **params).with_backend("reference")
        origin, dirs = primary_rays(cam, w, h)
        d = tile_rays(dirs, 16, 16).reshape(-1, 3)
        o = jnp.broadcast_to(origin, d.shape)
        tmax = jnp.full(d.shape[:1], BIG, jnp.float32)
        color = render_wavefront(s, o, d, tmax, opts, tile_hw=(16, 16))
        img = untile_image(color.reshape(-1, 256, 3), h, w, 16, 16)
        return jnp.mean(img * img)

    vf, gf = jax.value_and_grad(loss_fast)(params)
    vp, gp = jax.value_and_grad(loss_portable)(params)
    assert np.isfinite(float(vf)) and np.isfinite(float(vp))
    assert abs(float(vf) - float(vp)) < 3e-4 * max(1.0, abs(float(vp)))
    for k in params:
        a, b = np.asarray(gf[k]), np.asarray(gp[k])
        assert np.isfinite(a).all(), k
        # hits agree except possibly at a handful of tie/edge pixels;
        # compare the bulk of the gradient mass
        denom = max(np.abs(b).max(), 1e-8)
        assert np.quantile(np.abs(a - b), 0.999) < 5e-3 * denom, k
        assert np.abs(a - b).mean() < 1e-3 * denom, k
