"""Minimal kernel timing: camera_trace + shadow warm times on feline 1024^2.

Unbuffered one-line-per-metric output; every knob comes from the
SNAIL_* env vars read by snail_tpu.ops.traverse_pallas at import time.
Usage:  python -u tools/kbench.py [primary|shadow|both]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    import jax
    import jax.numpy as jnp

    from snail_tpu.core.types import Camera, Light
    from snail_tpu.core.vecmath import BIG
    from snail_tpu.ops.traverse_pallas import any_hit_shared, camera_trace
    from snail_tpu.scene.scene import load_scene

    W = H = 1024
    lights = Light.make((5.0, 15.0, 5.0), (1.0, 1.0, 1.0), 60.0)
    scene = load_scene("/root/reference/scenes/feline.obj",
                       cache_dir="/tmp/snail_dump", lights=lights)
    lo, hi = np.asarray(scene.node_lo[0]), np.asarray(scene.node_hi[0])
    center = (lo + hi) * 0.5
    ext = float(np.max(hi - lo))
    cam = Camera.look_at(
        pos=tuple(center + np.array([0.45, 0.35, 0.9]) * ext),
        target=tuple(center))

    def timeit(fn, n=5, batches=4):
        """Min over batch means (batches pipeline device dispatch;
        min rejects tunnel/tenant interference spikes)."""
        out = fn()
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(batches):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    cfg = {k: v for k, v in os.environ.items() if k.startswith("SNAIL_")}
    if which in ("primary", "both"):
        t = timeit(lambda: camera_trace(scene, cam, W, H))
        print(f"primary {t*1e3:8.3f} ms  {W*H/t/1e6:7.2f} MRays/s  {cfg}",
              flush=True)
    if which in ("shadow", "both"):
        from snail_tpu.ops.traverse_pallas import PACKET_R

        dist, u, v, tri, dx, dy, dz = camera_trace(scene, cam, W, H)
        lp = lights.pos[0]
        hit = (dist > 0) & (dist < BIG)
        px = cam.pos[0] + dx * dist
        py = cam.pos[1] + dy * dist
        pz = cam.pos[2] + dz * dist
        lvx, lvy, lvz = px - lp[0], py - lp[1], pz - lp[2]
        ld = jnp.sqrt(lvx**2 + lvy**2 + lvz**2)
        fl = tuple(c / ld for c in (lvx, lvy, lvz))
        stm = jnp.where(hit, ld * 0.9999, -BIG)

        # masked-ray packet-mean substitution (render/fast.py shadow prep)
        def _pkmean(c):
            cm = jnp.where(hit, c, 0.0).reshape(-1, PACKET_R)
            return cm.sum(axis=1) / jnp.maximum(
                hit.reshape(-1, PACKET_R).sum(axis=1), 1)

        md = [jnp.repeat(_pkmean(c), PACKET_R) for c in fl]
        mlen = sum(c * c for c in md)
        md[2] = jnp.where(mlen < 1e-12, 1.0, md[2])
        sd = tuple(jnp.where(hit, c, m) for c, m in zip(fl, md))
        sd = tuple(jax.block_until_ready(c) for c in sd)
        t = timeit(lambda: any_hit_shared(scene, lp, sd, stm))
        print(f"shadow  {t*1e3:8.3f} ms  {W*H/t/1e6:7.2f} MRays/s  {cfg}",
              flush=True)
    if which in ("frame", "both"):
        from snail_tpu.core.types import RenderOpts
        from snail_tpu.render.fast import render_frame_fast

        opts = RenderOpts(reflections=False, transparency=False,
                          textures=False)
        t = timeit(lambda: render_frame_fast(scene, cam, W, H, opts))
        print(f"frame   {t*1e3:8.3f} ms  {2*W*H/t/1e6:7.2f} MRays/s  {cfg}",
              flush=True)


if __name__ == "__main__":
    main()
