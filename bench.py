"""Headline benchmark: Whitted forward render MRays/s on one TPU chip.

Mirrors the reference's benchmark methodology (benchmark.txt: avg FPS over
frames at fixed resolution, MRays/s counting primary + shadow rays; client
stat accumulation client.cpp:215-252). Scene: feline.obj (the largest
reference scene shipped; sponza.obj geometry is not in the mount) at
1024x1024 with one point light — primary + shadow rays, i.e. 2 rays/pixel.

Baseline: 100 MRays/s/chip — the BASELINE.json north-star per-chip target
(one TPU chip vs the reference's full 8-node cluster, which peaks at
153-160 MRays/s on sponza-no-tex and 44 on one node).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

WIDTH = HEIGHT = 1024
FRAMES = 8
BASELINE_MRAYS = 100.0
FELINE = "/root/reference/scenes/feline.obj"


def main():
    import jax
    import jax.numpy as jnp

    from snail_tpu.core.types import Camera, Light, RenderOpts
    from snail_tpu.render.renderer import render_frame
    from snail_tpu.scene.scene import load_scene, make_traced_scene

    if os.path.exists(FELINE):
        lights = Light.make((5.0, 15.0, 5.0), (1.0, 1.0, 1.0), 60.0)
        scene = load_scene(FELINE, cache_dir="/tmp/snail_dump", lights=lights)
        lo, hi = np.asarray(scene.node_lo[0]), np.asarray(scene.node_hi[0])
        scene_name = "feline"
    else:  # self-contained fallback
        from snail_tpu.bvh import build_bvh
        from snail_tpu.scene.procedural import city_scene

        base = city_scene(24)
        g = base.flatten()
        tlo, thi = g.bounds()
        bvh = build_bvh(tlo, thi, leaf_size=64)
        lights = Light.make((0.0, 30.0, 0.0), (1.0, 1.0, 1.0), 120.0)
        scene = make_traced_scene(g, bvh, lights=lights)
        lo, hi = np.asarray(scene.node_lo[0]), np.asarray(scene.node_hi[0])
        scene_name = "city"

    center = (lo + hi) * 0.5
    ext = float(np.max(hi - lo))
    cam = Camera.look_at(
        pos=tuple(center + np.array([0.45, 0.35, 0.9]) * ext),
        target=tuple(center),
    )
    opts = RenderOpts(
        reflections=False, transparency=False, textures=False
    )

    img = render_frame(scene, cam, WIDTH, HEIGHT, opts)
    img.block_until_ready()  # warmup/compile

    t0 = time.perf_counter()
    for _ in range(FRAMES):
        img = render_frame(scene, cam, WIDTH, HEIGHT, opts)
    img.block_until_ready()
    dt = (time.perf_counter() - t0) / FRAMES

    n_lights = scene.lights.pos.shape[0]
    rays = WIDTH * HEIGHT * (1 + n_lights)  # primary + shadow per light
    mrays = rays / dt / 1e6

    print(json.dumps({
        "metric": f"{scene_name}_1024_whitted_fwd",
        "value": round(mrays, 2),
        "unit": "MRays/s/chip",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
    }))

    # --- forward + backward (the BASELINE.json metric): one render +
    # gradient step w.r.t. vertices and materials through the
    # differentiable integrator (traversal under stop_gradient +
    # closed-form recompute, snail_tpu/diff/vjp.py) ---
    import dataclasses

    import jax.numpy as jnp

    from snail_tpu.render.integrator import render_wavefront
    from snail_tpu.render.raygen import primary_rays, tile_rays
    from snail_tpu.core.vecmath import BIG

    th = tw = 16
    origin, dirs = primary_rays(cam, WIDTH, HEIGHT)
    d = tile_rays(dirs, th, tw).reshape(-1, 3)
    o = jnp.broadcast_to(origin, d.shape)
    tmax = jnp.full(d.shape[:1], BIG, jnp.float32)
    target = jax.lax.stop_gradient(
        render_frame(scene, cam, WIDTH, HEIGHT, opts)
    ).reshape(-1, 3)

    params = {"tri_a": scene.tri_a, "mat_diffuse": scene.mat_diffuse}

    @jax.jit
    def step(params):
        s = dataclasses.replace(scene, **params)
        color = render_wavefront(s, o, d, tmax, opts, tile_hw=(th, tw))
        loss = jnp.mean((color - target) ** 2)
        return loss

    vg = jax.jit(jax.value_and_grad(step))
    loss, grads = vg(params)
    loss.block_until_ready()  # warmup/compile
    assert bool(jnp.isfinite(loss)), loss
    for k, g in grads.items():
        assert bool(jnp.isfinite(g).all()), k

    t0 = time.perf_counter()
    for _ in range(FRAMES):
        loss, grads = vg(params)
    loss.block_until_ready()
    dtb = (time.perf_counter() - t0) / FRAMES
    mrays_b = rays / dtb / 1e6

    print(json.dumps({
        "metric": f"{scene_name}_1024_whitted_fwd_bwd",
        "value": round(mrays_b, 2),
        "unit": "MRays/s/chip",
        "vs_baseline": round(mrays_b / BASELINE_MRAYS, 3),
        "fwd_only_mrays": round(mrays, 2),
        "fwd_only_vs_baseline": round(mrays / BASELINE_MRAYS, 3),
    }))


if __name__ == "__main__":
    main()
