"""Headline benchmark: Whitted render MRays/s on one TPU chip.

Mirrors the reference's benchmark methodology (benchmark.txt: avg FPS over
frames at fixed resolution, MRays/s counting primary + shadow rays; client
stat accumulation client.cpp:215-252). Scene: feline.obj (the largest
reference scene shipped; sponza.obj geometry is not in the mount) at
1024x1024 with one point light — primary + shadow rays, i.e. 2 rays/pixel.

Baseline: 100 MRays/s/chip — the BASELINE.json north-star per-chip target
(one TPU chip vs the reference's full 8-node cluster, which peaks at
153-160 MRays/s on sponza-no-tex and 44 on one node).

Up to four JSON metric lines, each flushed the moment it is measured so a
driver timeout can never erase an already-computed number:
  1. forward               (feline_1024_whitted_fwd)
  2. forward, textured     (feline_1024_whitted_fwd_tex — the reference's
                            headline sponza row is WITH textures,
                            benchmark.txt:91-94; runs unconditionally:
                            round 3 starved it behind a budget gate)
  3. paged forward         (terrain_1m_paged_fwd — the reference's
                            large-scene rows foot 1.06 Mtri / thai 10 Mtri,
                            benchmark.txt:78-80, 101-104; ~1.05 Mtri
                            procedural terrain through the two-level paged
                            kernels; budget-gated, it needs a BVH build)
  4. forward+backward      (feline_1024_whitted_fwd_bwd — the BASELINE.json
                            metric; printed LAST so the driver's last-line
                            parse records the north star). Differentiates
                            the FULL north-star set — vertices, materials,
                            light position/color, camera position — with
                            shadows AND reflections on (BASELINE config 4),
                            not the cheapest shading mode.
Sections are skipped (not attempted) when the remaining time budget
(SNAIL_BENCH_BUDGET seconds, default 420) can't fit their compile.
"""

import json
import os
import sys
import time
import traceback

import numpy as np

WIDTH = HEIGHT = 1024
FRAMES = 8
BASELINE_MRAYS = 100.0
FELINE = "/root/reference/scenes/feline.obj"
BUDGET_S = float(os.environ.get("SNAIL_BENCH_BUDGET", 420))
_T0 = time.monotonic()


def emit(obj):
    print(json.dumps(obj), flush=True)


def left():
    return BUDGET_S - (time.monotonic() - _T0)


def _retry(fn, tries=4, sleep_s=45):
    """The axon TPU tunnel intermittently ABORTs the first heavy kernel
    launch and needs a cool-down before it recovers (round-4 field
    observation: ~50% of fresh launches on big scenes). Retry with
    sleeps so one flake can't erase a whole bench section."""
    last = None
    for i in range(tries):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - backend aborts vary
            last = e
            if "bort" not in str(e) and "INTERNAL" not in str(e):
                raise
            print(f"# TPU abort (attempt {i + 1}/{tries}); "
                  f"sleeping {sleep_s}s", file=sys.stderr, flush=True)
            time.sleep(sleep_s)
    raise last


def bench_loop(fn, frames=FRAMES):
    _retry(lambda: jax_block(fn()))  # warmup/compile (abort-retried)
    t0 = time.perf_counter()
    for _ in range(frames):
        out = fn()
    jax_block(out)
    return (time.perf_counter() - t0) / frames


def jax_block(x):
    import jax

    jax.block_until_ready(x)


def _camera_for(scene):
    import numpy as np

    from snail_tpu.core.types import Camera

    lo, hi = np.asarray(scene.node_lo[0]), np.asarray(scene.node_hi[0])
    center = (lo + hi) * 0.5
    ext = float(np.max(hi - lo))
    return Camera.look_at(
        pos=tuple(center + np.array([0.45, 0.35, 0.9]) * ext),
        target=tuple(center),
    )


def bench_paged():
    """Large-scene paged row (the tools/bench_big.py config, in-budget)."""
    from snail_tpu.bvh.cache import build_or_load
    from snail_tpu.core.types import Camera, Light, RenderOpts
    from snail_tpu.render.fast import render_frame_fast
    from snail_tpu.scene.procedural import terrain_scene
    from snail_tpu.scene.scene import make_traced_scene

    n = 724  # ~1.05 Mtri
    g = terrain_scene(n).flatten()
    lo, hi = g.bounds()
    # leaf 32 measured 286 ms vs 457 at leaf 16 on the chip (round 4)
    bvh = build_or_load(lo, hi, cache_dir="/tmp/snail_dump",
                        name=f"terrain{n}32", leaf_size=32)
    lights = Light.make((0.0, 60.0, 0.0), (1.0, 1.0, 1.0), 200.0)
    scene = make_traced_scene(g, bvh, lights=lights)
    assert scene.pg_meta is not None, "expected a paged scene"
    slo, shi = np.asarray(scene.node_lo[0]), np.asarray(scene.node_hi[0])
    center = (slo + shi) * 0.5
    ext = float(np.max(shi - slo))
    cam = Camera.look_at(pos=tuple(center + np.array([0.35, 0.25, 0.4]) * ext),
                         target=tuple(center))
    opts = RenderOpts(reflections=False, transparency=False, textures=False)
    dt = bench_loop(lambda: render_frame_fast(scene, cam, WIDTH, HEIGHT,
                                              opts))
    mrays = 2 * WIDTH * HEIGHT / dt / 1e6
    emit({
        "metric": "terrain_1m_paged_fwd",
        "value": round(mrays, 2),
        "unit": "MRays/s/chip",
        "tris": scene.num_tris,
        # vs the reference's 1-node foot.obj 1.06 Mtri row
        # (35 MRays/s, benchmark.txt:78-80)
        "vs_baseline": round(mrays / 35.0, 3),
    })


def main():
    import jax
    import jax.numpy as jnp

    from snail_tpu.core.types import Camera, Light, RenderOpts
    from snail_tpu.render.renderer import render_frame
    from snail_tpu.scene.scene import load_scene, make_traced_scene

    if os.path.exists(FELINE):
        lights = Light.make((5.0, 15.0, 5.0), (1.0, 1.0, 1.0), 60.0)
        scene = load_scene(FELINE, cache_dir="/tmp/snail_dump", lights=lights)
        scene_name = "feline"
    else:  # self-contained fallback
        from snail_tpu.bvh import build_bvh
        from snail_tpu.scene.procedural import city_scene

        base = city_scene(24)
        g = base.flatten()
        tlo, thi = g.bounds()
        bvh = build_bvh(tlo, thi, leaf_size=16)
        lights = Light.make((0.0, 30.0, 0.0), (1.0, 1.0, 1.0), 120.0)
        scene = make_traced_scene(g, bvh, lights=lights)
        scene_name = "city"

    cam = _camera_for(scene)
    opts = RenderOpts(reflections=False, transparency=False, textures=False)

    n_lights = scene.lights.pos.shape[0]
    rays = WIDTH * HEIGHT * (1 + n_lights)  # primary + shadow per light

    # --- 1. forward (printed FIRST: the fallback headline) ---
    mrays = 0.0
    try:
        dt = bench_loop(lambda: render_frame(scene, cam, WIDTH, HEIGHT,
                                             opts))
        mrays = rays / dt / 1e6
        emit({
            "metric": f"{scene_name}_1024_whitted_fwd",
            "value": round(mrays, 2),
            "unit": "MRays/s/chip",
            "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
        })
    except Exception:
        traceback.print_exc()
        sys.stderr.flush()

    # --- 2. forward, textured (reference headline row is sponza+tex;
    # unconditional — round 3's budget gate starved it) ---
    try:
        from snail_tpu.scene.textures import checker_atlas

        tex_scene = checker_atlas(scene)
        topts = RenderOpts(reflections=False, transparency=False,
                           textures=True)
        dtt = bench_loop(
            lambda: render_frame(tex_scene, cam, WIDTH, HEIGHT, topts)
        )
        mrays_t = rays / dtt / 1e6
        emit({
            "metric": f"{scene_name}_1024_whitted_fwd_tex",
            "value": round(mrays_t, 2),
            "unit": "MRays/s/chip",
            "vs_baseline": round(mrays_t / BASELINE_MRAYS, 3),
        })
    except Exception:
        traceback.print_exc()
        sys.stderr.flush()

    # --- 3. paged large-scene forward (needs BVH build + fresh compile:
    # only when the budget clearly fits it AND the backward section) ---
    try:
        if left() > 300:
            bench_paged()
    except Exception:
        traceback.print_exc()
        sys.stderr.flush()

    # --- 4. forward + backward (the BASELINE.json metric, printed LAST
    # so the driver's last-line parse records it): one render + gradient
    # w.r.t. the FULL north-star parameter set (vertices, materials,
    # light pos/color, camera pos — BASELINE config 4) through the
    # differentiable FAST path, with shadows AND reflections on ---
    import dataclasses

    from snail_tpu.core.types import Light as _Light
    from snail_tpu.render.fast import render_frame_fast_diff

    bopts = RenderOpts(reflections=True, transparency=False, textures=False,
                       shadows=True)
    target = _retry(lambda: jax.block_until_ready(jax.lax.stop_gradient(
        render_frame(scene, cam, WIDTH, HEIGHT, bopts)
    )))
    params = {
        "tri_a": scene.tri_a,
        "mat_diffuse": scene.mat_diffuse,
        "light_pos": scene.lights.pos,
        "light_color": scene.lights.color,
        "cam_pos": cam.pos,
    }

    # NB: scene/target are jit ARGUMENTS — closing over them would inline
    # ~60 MB of arrays as HLO constants and blow the compile budget (the
    # round-2 bench-timeout failure mode)
    def step(params, scene, camera, target):
        lights = _Light(pos=params["light_pos"],
                        color=params["light_color"],
                        radius=scene.lights.radius)
        s = dataclasses.replace(scene, tri_a=params["tri_a"],
                                mat_diffuse=params["mat_diffuse"],
                                lights=lights)
        c = dataclasses.replace(camera, pos=params["cam_pos"])
        color = render_frame_fast_diff(s, c, WIDTH, HEIGHT, bopts)
        return jnp.mean((color - target) ** 2)

    vg = jax.jit(jax.value_and_grad(step))
    loss, grads = _retry(lambda: jax.block_until_ready(
        vg(params, scene, cam, target)))
    assert bool(jnp.isfinite(loss)), loss
    for k, g in grads.items():
        assert bool(jnp.isfinite(g).all()), k

    dtb = bench_loop(lambda: vg(params, scene, cam, target))
    mrays_b = rays / dtb / 1e6
    emit({
        "metric": f"{scene_name}_1024_whitted_fwd_bwd",
        "value": round(mrays_b, 2),
        "unit": "MRays/s/chip",
        "vs_baseline": round(mrays_b / BASELINE_MRAYS, 3),
        "fwd_only_mrays": round(mrays, 2),
        "grad_params": sorted(params),
        "config": "shadows+reflections on",
    })


if __name__ == "__main__":
    main()
