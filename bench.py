"""Headline benchmark: Whitted render MRays/s on one TPU chip.

Mirrors the reference's benchmark methodology (benchmark.txt: avg FPS over
frames at fixed resolution, MRays/s counting primary + shadow rays; client
stat accumulation client.cpp:215-252). Scene: feline.obj (the largest
reference scene shipped; sponza.obj geometry is not in the mount) at
1024x1024 with one point light — primary + shadow rays, i.e. 2 rays/pixel.

Baseline: 100 MRays/s/chip — the BASELINE.json north-star per-chip target
(one TPU chip vs the reference's full 8-node cluster, which peaks at
153-160 MRays/s on sponza-no-tex and 44 on one node).

Up to four JSON metric lines, each flushed the moment it is measured:
  1. forward               (feline_1024_whitted_fwd)
  2. forward, textured     (feline_1024_whitted_fwd_tex — the reference's
                            headline sponza row is WITH textures,
                            benchmark.txt:91-94)
  3. paged forward         (terrain_1m_paged_fwd — the reference's
                            large-scene rows foot 1.06 Mtri / thai 10 Mtri,
                            benchmark.txt:78-80, 101-104; ~1.05 Mtri
                            procedural terrain through the two-level paged
                            kernels)
  4. forward+backward      (feline_1024_whitted_fwd_bwd — the BASELINE.json
                            metric; printed LAST so the driver's last-line
                            parse records the north star). Differentiates
                            the FULL north-star set — vertices, materials,
                            light position/color, camera position — with
                            shadows AND reflections on (BASELINE config 4).

Robustness: the axon TPU tunnel intermittently ABORTs heavy kernel
launches, and once a process's client has aborted it often stays dead.
Each section therefore runs in its OWN SUBPROCESS (SNAIL_BENCH_SECTION)
with retries + cool-downs, so a dead client costs one retry, not the
whole benchmark. Budget: SNAIL_BENCH_BUDGET seconds (default 420).
"""

import json
import os
import subprocess
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


def bench_loop(fn, frames=FRAMES):
    out = fn()
    jax_block(out)  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(frames):
        out = fn()
    jax_block(out)
    return (time.perf_counter() - t0) / frames


def jax_block(x):
    import jax

    jax.block_until_ready(x)


def _load_headline_scene():
    from snail_tpu.core.types import Light
    from snail_tpu.scene.scene import load_scene, make_traced_scene

    if os.path.exists(FELINE):
        lights = Light.make((5.0, 15.0, 5.0), (1.0, 1.0, 1.0), 60.0)
        scene = load_scene(FELINE, cache_dir="/tmp/snail_dump",
                           lights=lights)
        return scene, "feline"
    # self-contained fallback
    from snail_tpu.bvh import build_bvh
    from snail_tpu.core.types import Light
    from snail_tpu.scene.procedural import city_scene

    base = city_scene(24)
    g = base.flatten()
    tlo, thi = g.bounds()
    bvh = build_bvh(tlo, thi, leaf_size=16)
    lights = Light.make((0.0, 30.0, 0.0), (1.0, 1.0, 1.0), 120.0)
    return make_traced_scene(g, bvh, lights=lights), "city"


def _camera_for(scene):
    from snail_tpu.core.types import Camera

    lo, hi = np.asarray(scene.node_lo[0]), np.asarray(scene.node_hi[0])
    center = (lo + hi) * 0.5
    ext = float(np.max(hi - lo))
    return Camera.look_at(
        pos=tuple(center + np.array([0.45, 0.35, 0.9]) * ext),
        target=tuple(center),
    )


def section_fwd():
    from snail_tpu.core.types import RenderOpts
    from snail_tpu.render.renderer import render_frame

    scene, name = _load_headline_scene()
    cam = _camera_for(scene)
    opts = RenderOpts(reflections=False, transparency=False, textures=False)
    rays = WIDTH * HEIGHT * (1 + scene.lights.pos.shape[0])
    dt = bench_loop(lambda: render_frame(scene, cam, WIDTH, HEIGHT, opts))
    mrays = rays / dt / 1e6
    emit({
        "metric": f"{name}_1024_whitted_fwd",
        "value": round(mrays, 2),
        "unit": "MRays/s/chip",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
    })


def section_tex():
    from snail_tpu.core.types import RenderOpts
    from snail_tpu.render.renderer import render_frame
    from snail_tpu.scene.textures import checker_atlas

    scene, name = _load_headline_scene()
    cam = _camera_for(scene)
    tex_scene = checker_atlas(scene)
    topts = RenderOpts(reflections=False, transparency=False, textures=True)
    rays = WIDTH * HEIGHT * (1 + scene.lights.pos.shape[0])
    dt = bench_loop(lambda: render_frame(tex_scene, cam, WIDTH, HEIGHT,
                                         topts))
    mrays = rays / dt / 1e6
    emit({
        "metric": f"{name}_1024_whitted_fwd_tex",
        "value": round(mrays, 2),
        "unit": "MRays/s/chip",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
    })


def section_paged():
    """Large-scene paged row (the tools/bench_big.py config)."""
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
    cam = Camera.look_at(
        pos=tuple(center + np.array([0.35, 0.25, 0.4]) * ext),
        target=tuple(center))
    opts = RenderOpts(reflections=False, transparency=False, textures=False)
    dt = bench_loop(lambda: render_frame_fast(scene, cam, WIDTH, HEIGHT,
                                              opts))
    mrays = 2 * WIDTH * HEIGHT / dt / 1e6
    # REAL in-kernel counters for the large-scene config (the round-4
    # verdict's "paged counters row"; TreeStats rebuild)
    from snail_tpu.render.fast import (render_frame_fast_stats,
                                       stats_path_available)

    if stats_path_available(scene):
        _, kstats = render_frame_fast_stats(scene, cam, WIDTH, HEIGHT,
                                            opts)
        emit({
            "metric": "terrain_1m_paged_counters",
            "value": round(kstats["leaves"] / (2 * (WIDTH // 64)
                                               * (HEIGHT // 64)), 1),
            "unit": "leaves/packet",
            "counters": {k: int(v) for k, v in kstats.items()},
        })
    emit({
        "metric": "terrain_1m_paged_fwd",
        "value": round(mrays, 2),
        "unit": "MRays/s/chip",
        "tris": scene.num_tris,
        # vs the reference's 1-node foot.obj 1.06 Mtri row
        # (35 MRays/s, benchmark.txt:78-80)
        "vs_baseline": round(mrays / 35.0, 3),
    })


def section_bwd():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from snail_tpu.core.types import Light as _Light
    from snail_tpu.core.types import RenderOpts
    from snail_tpu.render.fast import render_frame_fast_diff
    from snail_tpu.render.renderer import render_frame

    scene, name = _load_headline_scene()
    cam = _camera_for(scene)
    rays = WIDTH * HEIGHT * (1 + scene.lights.pos.shape[0])
    bopts = RenderOpts(reflections=True, transparency=False, textures=False,
                       shadows=True)
    target = jax.lax.stop_gradient(
        render_frame(scene, cam, WIDTH, HEIGHT, bopts)
    )
    params = {
        "tri_a": scene.tri_a,
        "tri_ba": scene.tri_ba,
        "tri_ca": scene.tri_ca,
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
                                tri_ba=params["tri_ba"],
                                tri_ca=params["tri_ca"],
                                mat_diffuse=params["mat_diffuse"],
                                lights=lights)
        c = dataclasses.replace(camera, pos=params["cam_pos"])
        color = render_frame_fast_diff(s, c, WIDTH, HEIGHT, bopts)
        return jnp.mean((color - target) ** 2)

    vg = jax.jit(jax.value_and_grad(step))
    loss, grads = vg(params, scene, cam, target)
    jax_block(loss)  # warmup/compile
    assert bool(jnp.isfinite(loss)), loss
    for k, g in grads.items():
        assert bool(jnp.isfinite(g).all()), k

    dtb = bench_loop(lambda: vg(params, scene, cam, target))
    mrays_b = rays / dtb / 1e6
    emit({
        "metric": f"{name}_1024_whitted_fwd_bwd",
        "value": round(mrays_b, 2),
        "unit": "MRays/s/chip",
        "vs_baseline": round(mrays_b / BASELINE_MRAYS, 3),
        "grad_params": sorted(params),
        "config": "shadows+reflections on; all three vertex arrays diffed",
    })


def section_bwd_min():
    """Round-3-comparable backward row: cheapest shading config
    (no secondary rays), vertices+materials only — kept so the
    full-gradient row above can be compared across rounds."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from snail_tpu.core.types import RenderOpts
    from snail_tpu.render.fast import render_frame_fast_diff
    from snail_tpu.render.renderer import render_frame

    scene, name = _load_headline_scene()
    cam = _camera_for(scene)
    rays = WIDTH * HEIGHT * (1 + scene.lights.pos.shape[0])
    opts = RenderOpts(reflections=False, transparency=False, textures=False)
    target = jax.lax.stop_gradient(
        render_frame(scene, cam, WIDTH, HEIGHT, opts))
    params = {"tri_a": scene.tri_a, "mat_diffuse": scene.mat_diffuse}

    def step(params, scene, target):
        s = dataclasses.replace(scene, **params)
        color = render_frame_fast_diff(s, cam, WIDTH, HEIGHT, opts)
        return jnp.mean((color - target) ** 2)

    vg = jax.jit(jax.value_and_grad(step))
    loss, grads = vg(params, scene, target)
    jax_block(loss)
    assert bool(jnp.isfinite(loss)), loss
    dt = bench_loop(lambda: vg(params, scene, target))
    mrays = rays / dt / 1e6
    emit({
        "metric": f"{name}_1024_whitted_fwd_bwd_minimal",
        "value": round(mrays, 2),
        "unit": "MRays/s/chip",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
        "config": "r3-comparable: no secondary rays, tri_a+mat grads",
    })


def section_multilight():
    """The reference's best-scaling headline config (abrams 1024^2,
    4 lights, 4x supersampling: 85 MRays/s on one 2008 node,
    benchmark.txt:126-129; abrams.obj 116 Ktri is not mounted so
    feline.obj 100 Ktri stands in — the closest mounted scene by
    triangle count). 4xAA renders at 2048^2 and box-averages; MRays/s counts
    all rays per sample (1 primary + 4 shadow) like the reference's
    client accounting (client.cpp:374-379)."""
    from snail_tpu.core.types import Camera, Light, RenderOpts
    from snail_tpu.render.renderer import render_frame
    from snail_tpu.scene.scene import load_scene

    path = FELINE
    if not os.path.exists(path):
        print("# no feline.obj", file=sys.stderr)
        return
    lights = Light(
        pos=np.array([[8.0, 12.0, 8.0], [-8.0, 12.0, 8.0],
                      [8.0, 12.0, -8.0], [-8.0, 12.0, -8.0]], np.float32),
        color=np.full((4, 3), 0.8, np.float32),
        radius=np.full((4,), 60.0, np.float32),
    )
    scene = load_scene(path, cache_dir="/tmp/snail_dump", lights=lights)
    cam = _camera_for(scene)
    opts = RenderOpts(reflections=False, transparency=False,
                      textures=False, supersample=True)
    rays = WIDTH * HEIGHT * 4 * (1 + 4)  # 4 samples x (primary+4 shadow)
    dt = bench_loop(lambda: render_frame(scene, cam, WIDTH, HEIGHT,
                                         opts), frames=4)
    mrays = rays / dt / 1e6
    emit({
        "metric": "feline_1024_4light_4xAA_fwd",
        "value": round(mrays, 2),
        "unit": "MRays/s/chip",
        "tris": scene.num_tris,
        # vs the reference's abrams 1-node row (85 MRays/s,
        # benchmark.txt:126-129)
        "vs_baseline": round(mrays / 85.0, 3),
    })


def section_10m():
    """Thai-class scale row (reference thai.obj 10 Mtri: 17 MRays/s on
    one 2008 node, benchmark.txt:101-104): ~10.0 Mtri procedural
    terrain through the worklist kernels with 127-tri leaves (the
    subprocess runs with SNAIL_IVAL_LEAF=128). Records the host build
    seconds (reference LoadNewModel builds thai in seconds,
    server.cpp:269-310)."""
    from snail_tpu.bvh.build import build_bvh
    from snail_tpu.core.types import Camera, Light, RenderOpts
    from snail_tpu.render.fast import render_frame_fast
    from snail_tpu.scene.procedural import terrain_scene
    from snail_tpu.scene.scene import make_traced_scene

    n = 2236  # 2*n^2 ~ 10.0 Mtri
    t0 = time.perf_counter()
    g = terrain_scene(n).flatten()
    t_gen = time.perf_counter() - t0
    lo, hi = g.bounds()
    t0 = time.perf_counter()
    bvh = build_bvh(lo, hi, leaf_size=127)
    t_build = time.perf_counter() - t0
    lights = Light.make((0.0, 60.0, 0.0), (1.0, 1.0, 1.0), 400.0)
    t0 = time.perf_counter()
    scene = make_traced_scene(g, bvh, lights=lights, leaf_pad=128)
    t_pack = time.perf_counter() - t0
    assert scene.wl_lfc is not None, "expected the worklist path"
    slo, shi = np.asarray(scene.node_lo[0]), np.asarray(scene.node_hi[0])
    center = (slo + shi) * 0.5
    ext = float(np.max(shi - slo))
    cam = Camera.look_at(
        pos=tuple(center + np.array([0.35, 0.25, 0.4]) * ext),
        target=tuple(center))
    opts = RenderOpts(reflections=False, transparency=False,
                      textures=False)
    dt = bench_loop(lambda: render_frame_fast(scene, cam, WIDTH, HEIGHT,
                                              opts), frames=4)
    mrays = 2 * WIDTH * HEIGHT / dt / 1e6
    emit({
        "metric": "terrain_10m_paged_fwd",
        "value": round(mrays, 2),
        "unit": "MRays/s/chip",
        "tris": scene.num_tris,
        "build_s": round(t_build, 1),
        "gen_s": round(t_gen, 1),
        "pack_s": round(t_pack, 1),
        # vs the reference's 1-node thai.obj row (17 MRays/s,
        # benchmark.txt:101-104)
        "vs_baseline": round(mrays / 17.0, 3),
    })


SECTIONS = {
    "fwd": section_fwd,
    "tex": section_tex,
    "paged": section_paged,
    "multilight": section_multilight,
    "10m": section_10m,
    "bwd_min": section_bwd_min,
    "bwd": section_bwd,
}

# minimum seconds of remaining budget to ATTEMPT a section (compile cost)
_MIN_BUDGET = {"fwd": 60, "tex": 60, "paged": 120, "multilight": 90,
               "10m": 150, "bwd_min": 120, "bwd": 150}

# per-section environment overrides for the subprocess
_SECTION_ENV = {"10m": {"SNAIL_IVAL_LEAF": "128"}}


def _drive():
    """Run each section in a fresh subprocess with retries: an ABORTed
    TPU client dies with the subprocess instead of poisoning the rest."""
    bwd_line = None
    # execution order puts the north-star backward row right after fwd
    # so a tight budget can never starve it (round-3 failure mode); the
    # bwd JSON line is still PRINTED last for the driver's last-line
    # parse.
    for name in ("fwd", "bwd", "bwd_min", "tex", "multilight", "paged",
                 "10m"):
        tries = 3 if name in ("fwd", "bwd") else 2
        for attempt in range(tries):
            if left() < _MIN_BUDGET[name]:
                print(f"# skip {name}: {left():.0f}s budget left",
                      file=sys.stderr, flush=True)
                break
            env = dict(os.environ)
            env.update(_SECTION_ENV.get(name, {}))
            env["SNAIL_BENCH_SECTION"] = name
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)], env=env,
                    capture_output=True, text=True,
                    timeout=max(60, left()),
                )
            except subprocess.TimeoutExpired:
                print(f"# {name} timed out", file=sys.stderr, flush=True)
                break
            got = False
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    if name == "bwd":
                        bwd_line = line  # re-print LAST (driver parses it)
                    else:
                        print(line, flush=True)
                    got = True
            if got:
                break
            sys.stderr.write(r.stderr[-2000:] + "\n")
            print(f"# {name} attempt {attempt + 1}/{tries} failed; "
                  f"cooling down 45s", file=sys.stderr, flush=True)
            time.sleep(45)
    if bwd_line:
        print(bwd_line, flush=True)


def main():
    sec = os.environ.get("SNAIL_BENCH_SECTION")
    if sec:
        SECTIONS[sec]()
        return
    _drive()


if __name__ == "__main__":
    main()
