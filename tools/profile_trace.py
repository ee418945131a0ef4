"""Kernel-level breakdown of the bench frame via the JAX profiler."""
import glob
import gzip
import json
import time


def main():
    import jax
    import numpy as np

    from snail_tpu.core.types import Camera, Light, RenderOpts
    from snail_tpu.render.renderer import render_frame
    from snail_tpu.scene.scene import load_scene

    W = H = 1024
    lights = Light.make((5.0, 15.0, 5.0), (1.0, 1.0, 1.0), 60.0)
    scene = load_scene("/root/reference/scenes/feline.obj",
                       cache_dir="/tmp/snail_dump", lights=lights)
    lo, hi = np.asarray(scene.node_lo[0]), np.asarray(scene.node_hi[0])
    center = (lo + hi) * 0.5
    ext = float(np.max(hi - lo))
    cam = Camera.look_at(pos=tuple(center + np.array([0.45, 0.35, 0.9]) * ext),
                         target=tuple(center))
    opts = RenderOpts(reflections=False, transparency=False, textures=False)

    img = render_frame(scene, cam, W, H, opts)
    img.block_until_ready()

    with jax.profiler.trace("/tmp/snail_trace"):
        for _ in range(4):
            img = render_frame(scene, cam, W, H, opts)
        img.block_until_ready()

    # parse the trace: sum durations by op name on the device track
    paths = glob.glob("/tmp/snail_trace/**/*.trace.json.gz", recursive=True)
    paths.sort(key=lambda p: -len(p))
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)
    durs = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        pid = ev.get("pid", 0)
        name = ev.get("name", "?")
        durs.setdefault((pid, name), [0.0, 0])
        durs[(pid, name)][0] += ev["dur"] / 1e3  # ms
        durs[(pid, name)][1] += 1
    items = sorted(durs.items(), key=lambda kv: -kv[1][0])
    for (pid, name), (ms, n) in items[:40]:
        print(f"{ms/4:9.3f} ms/frame x{n//4:4d}  pid={pid} {name[:110]}")


if __name__ == "__main__":
    main()
