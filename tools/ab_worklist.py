"""A/B the drain-only worklist kernels vs the walk kernels on the chip:
identical images + frame time, feline 1024^2 (SNAIL_WL env decides the
path, so this script runs itself twice in subprocesses)."""
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one():
    import jax

    from snail_tpu.core.types import Light, RenderOpts
    from snail_tpu.render.fast import render_frame_fast
    from snail_tpu.scene.scene import load_scene
    import bench

    lights = Light.make((5.0, 15.0, 5.0), (1.0, 1.0, 1.0), 60.0)
    scene = load_scene("/root/reference/scenes/feline.obj",
                       cache_dir="/tmp/snail_dump", lights=lights)
    cam = bench._camera_for(scene)
    opts = RenderOpts(reflections=False, transparency=False, textures=False)
    img = render_frame_fast(scene, cam, 1024, 1024, opts)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        img = render_frame_fast(scene, cam, 1024, 1024, opts)
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / n
    np.save(f"/tmp/ab_wl_{os.environ.get('SNAIL_WL', '1')}.npy",
            np.asarray(img))
    mode = "worklist" if os.environ.get("SNAIL_WL", "1") != "0" else "walk"
    print(f"{mode}: {dt * 1e3:.2f} ms/frame = "
          f"{2 * 1024 * 1024 / dt / 1e6:.1f} MRays/s")

    # bounce config too (reflections exercise the general kernels)
    opts2 = RenderOpts(reflections=True, transparency=False, textures=False)
    img2 = render_frame_fast(scene, cam, 1024, 1024, opts2)
    jax.block_until_ready(img2)
    t0 = time.perf_counter()
    for _ in range(n):
        img2 = render_frame_fast(scene, cam, 1024, 1024, opts2)
    jax.block_until_ready(img2)
    dt2 = (time.perf_counter() - t0) / n
    np.save(f"/tmp/ab_wl_refl_{os.environ.get('SNAIL_WL', '1')}.npy",
            np.asarray(img2))
    print(f"{mode} +refl: {dt2 * 1e3:.2f} ms/frame")


def main():
    for wl in ("0", "1"):
        env = dict(os.environ, SNAIL_WL=wl, SNAIL_AB_CHILD="1")
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True,
                           timeout=900)
        for ln in r.stdout.splitlines():
            if "ms/frame" in ln:
                print(ln)
        if r.returncode != 0:
            print(r.stderr[-3000:])
            return
    a = np.load("/tmp/ab_wl_0.npy")
    b = np.load("/tmp/ab_wl_1.npy")
    print("fwd  max|diff| =", float(np.abs(a - b).max()),
          " mismatched px =", int((np.abs(a - b).max(axis=-1) > 1e-4).sum()))
    a = np.load("/tmp/ab_wl_refl_0.npy")
    b = np.load("/tmp/ab_wl_refl_1.npy")
    print("refl max|diff| =", float(np.abs(a - b).max()),
          " mismatched px =", int((np.abs(a - b).max(axis=-1) > 1e-4).sum()))


if __name__ == "__main__":
    if os.environ.get("SNAIL_AB_CHILD"):
        run_one()
    else:
        main()
