"""Kernel-tunable scan on the bench config (feline 1024^2, real TPU).

Runs each (RAY_SUB, IVAL_LEAF, NBUF, leaf_size) combo in a subprocess so
the env-overridable module constants rebind. Prints a table of
camera_trace / full-frame times.
"""
import os
import subprocess
import sys

CONFIGS = [
    # ray_sub, ival_leaf, nbuf, leaf_size, qr
    # round-3 default: (32, 32, 24, 32, QR=16) ~18.4-20.6 ms prim.
    # Round-4 ablations: the scalar WALK is ~11 ms of that (nodma), so
    # the axes that matter are pops (leaf_size / packet size) and drain
    # granularity (QR).
    (32, 64, 16, 64, 16),    # half the walk, 2x drain tris
    (32, 16, 24, 16, 16),    # more walk, finer leaves
    (32, 32, 48, 32, 16),    # fewer syncs
    (32, 32, 24, 32, 32),    # whole-packet drains (fewest regions)
    (128, 32, 24, 32, 16),   # 4x fewer walks (16k-ray packets)
    (128, 64, 24, 64, 32),   # big packets + fat leaves + fat drains
]

CHILD = r"""
import time
import numpy as np

import jax
from snail_tpu.core.types import Camera, Light, RenderOpts
from snail_tpu.render.renderer import render_frame
from snail_tpu.scene.scene import load_scene
from snail_tpu.ops.traverse_pallas import camera_trace

W = H = 1024
leaf_size = int(__import__("os").environ["SNAIL_LEAF_SIZE"])
lights = Light.make((5.0, 15.0, 5.0), (1.0, 1.0, 1.0), 60.0)
scene = load_scene("/root/reference/scenes/feline.obj",
                   cache_dir="/tmp/snail_dump", lights=lights,
                   leaf_size=leaf_size)
lo, hi = np.asarray(scene.node_lo[0]), np.asarray(scene.node_hi[0])
center = (lo + hi) * 0.5
ext = float(np.max(hi - lo))
cam = Camera.look_at(pos=tuple(center + np.array([0.45, 0.35, 0.9]) * ext),
                     target=tuple(center))
opts = RenderOpts(reflections=False, transparency=False, textures=False)


def bench(fn, n=8):
    r = fn(); r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    r.block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3


t_prim = bench(lambda: camera_trace(scene, cam, W, H)[0])
t_frame = bench(lambda: render_frame(scene, cam, W, H, opts))
print(f"RESULT prim={t_prim:.2f}ms frame={t_frame:.2f}ms "
      f"mrays={2*W*H/t_frame/1e3:.1f}", flush=True)
"""


def main():
    for (rs, il, nb, ls, qr) in CONFIGS:
        env = dict(os.environ)
        env.update({
            "SNAIL_RAY_SUB": str(rs),
            "SNAIL_IVAL_LEAF": str(il),
            "SNAIL_NBUF": str(nb),
            "SNAIL_LEAF_SIZE": str(ls),
            "SNAIL_QR": str(qr),
        })
        tag = f"sub={rs:3d} leaf={il:2d} nbuf={nb:2d} ls={ls:2d} qr={qr:2d}"
        try:
            r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                               capture_output=True, text=True, timeout=1500)
        except subprocess.TimeoutExpired:
            print(f"{tag}  TIMEOUT", flush=True)
            continue
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        if line:
            print(f"{tag}  {line[0][7:]}", flush=True)
        else:
            err = (r.stderr or "").strip().splitlines()
            print(f"{tag}  FAILED: {err[-1] if err else r.returncode}",
                  flush=True)


if __name__ == "__main__":
    main()
