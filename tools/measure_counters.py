"""Real-TPU traversal counters on the bench config (feline 1024^2)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from snail_tpu.core.types import Camera, Light
    from snail_tpu.core.vecmath import BIG
    from snail_tpu.ops.traverse_pallas import (
        PACKET_R, any_hit_shared_stats, camera_trace, camera_trace_stats,
    )
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

    out = camera_trace_stats(scene, cam, W, H)
    dist, u, v, tri, dx, dy, dz = [np.asarray(x) for x in out[:-1]]
    st = np.asarray(out[-1]).astype(np.int64)
    p = st.shape[0]
    names = ["nodes", "leaf_enq", "leaf_proc", "tris", "chunks"]
    print(f"PRIMARY: {p} packets of {PACKET_R} rays; "
          f"scene nodes={scene.num_nodes} tris={scene.num_tris}")
    for k, nm in enumerate(names):
        col = st[:, k]
        print(f"  {nm:9s} total={col.sum():9d} mean/packet={col.mean():8.1f}"
              f" max={col.max():6d}")
    # per-RAY effective work
    print(f"  rays={W*H}; tri-tests/ray = {st[:,3].sum()*1.0/(W*H)*1:.2f} "
          f"(x{PACKET_R} lanes = {st[:,3].sum()*PACKET_R/(W*H):.0f} lane-tests/ray)")

    # shadow pass counters, frame-accurate masked dirs
    hit = (dist > 0) & (dist < BIG)
    lp = np.asarray(lights.pos[0])
    px = np.asarray(cam.pos)[0] + dx * dist
    py = np.asarray(cam.pos)[1] + dy * dist
    pz = np.asarray(cam.pos)[2] + dz * dist
    lvx, lvy, lvz = px - lp[0], py - lp[1], pz - lp[2]
    ld = np.sqrt(lvx**2 + lvy**2 + lvz**2)
    flx, fly, flz = lvx / ld, lvy / ld, lvz / ld

    def pkmean(c):
        cm = np.where(hit, c, 0.0).reshape(-1, PACKET_R)
        return cm.sum(1) / np.maximum(hit.reshape(-1, PACKET_R).sum(1), 1)

    mdx = np.repeat(pkmean(flx), PACKET_R)
    mdy = np.repeat(pkmean(fly), PACKET_R)
    mdz = np.repeat(pkmean(flz), PACKET_R)
    mdz = np.where(mdx**2 + mdy**2 + mdz**2 < 1e-12, 1.0, mdz)
    sdx = np.where(hit, flx, mdx)
    sdy = np.where(hit, fly, mdy)
    sdz = np.where(hit, flz, mdz)
    stm = np.where(hit, ld * 0.9999, -BIG).astype(np.float32)
    blocked, sst = any_hit_shared_stats(
        scene, lp, (jnp.asarray(sdx, jnp.float32), jnp.asarray(sdy, jnp.float32),
                    jnp.asarray(sdz, jnp.float32)), jnp.asarray(stm))
    sst = np.asarray(sst).astype(np.int64)
    print("SHADOW:")
    for k, nm in enumerate(names):
        col = sst[:, k]
        print(f"  {nm:9s} total={col.sum():9d} mean/packet={col.mean():8.1f}"
              f" max={col.max():6d}")

    # time the plain kernels for reference
    f = lambda: camera_trace(scene, cam, W, H)[0]
    r = f(); r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(8):
        r = f()
    r.block_until_ready()
    t = (time.perf_counter() - t0) / 8
    print(f"camera_trace: {t*1e3:.2f} ms ({W*H/t/1e6:.1f} MRays/s)")

    g = lambda: camera_trace_stats(scene, cam, W, H)[0]
    r = g(); r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(8):
        r = g()
    r.block_until_ready()
    t = (time.perf_counter() - t0) / 8
    print(f"camera_trace_stats: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
