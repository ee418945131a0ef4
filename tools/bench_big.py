"""Large-scene (>= 1 Mtri) paged-traversal benchmark + oracle check.

The reference's large-scene rows are foot.obj 1.06 Mtri (35 MRays/s on
one node, benchmark.txt:78-80) and thai 10 Mtri (17, benchmark.txt:101-104);
those meshes aren't mounted, so a ~1.05 Mtri procedural terrain stands in.
Renders through render_frame_fast (camera-fused paged kernel + paged
shadow kernel), spot-checks a random ray subset against the jnp
brute-force oracle, prints one timing line. Usage:
    python -u tools/bench_big.py [n]     # default n=724 (~1.05 Mtri)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 724
    import jax
    import jax.numpy as jnp

    from snail_tpu.bvh.cache import build_or_load
    from snail_tpu.core.types import Camera, Light, RenderOpts
    from snail_tpu.core.vecmath import BIG
    from snail_tpu.render.fast import render_frame_fast
    from snail_tpu.scene.procedural import terrain_scene
    from snail_tpu.scene.scene import make_traced_scene

    W = H = 1024
    t0 = time.time()
    g = terrain_scene(n).flatten()
    lo, hi = g.bounds()
    bvh = build_or_load(lo, hi, cache_dir="/tmp/snail_dump",
                        name=f"terrain{n}32", leaf_size=32)
    lights = Light.make((0.0, 60.0, 0.0), (1.0, 1.0, 1.0), 200.0)
    scene = make_traced_scene(g, bvh, lights=lights)
    print(f"scene: {scene.num_tris} tris, {scene.num_nodes} nodes, "
          f"paged={scene.pg_meta is not None} "
          f"({0 if scene.pg_meta is None else scene.pg_meta.shape[0]} pages)"
          f"  [build {time.time()-t0:.1f}s]", flush=True)

    slo, shi = np.asarray(scene.node_lo[0]), np.asarray(scene.node_hi[0])
    center = (slo + shi) * 0.5
    ext = float(np.max(shi - slo))
    cam = Camera.look_at(
        pos=tuple(center + np.array([0.35, 0.25, 0.4]) * ext),
        target=tuple(center))
    opts = RenderOpts(reflections=False, transparency=False, textures=False)

    t0 = time.time()
    img = render_frame_fast(scene, cam, W, H, opts)
    img.block_until_ready()
    print(f"compile+first frame {time.time()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(8):
        img = render_frame_fast(scene, cam, W, H, opts)
    img.block_until_ready()
    dt = (time.perf_counter() - t0) / 8
    mrays = 2 * W * H / dt / 1e6
    print(f"terrain{n} 1024^2 fwd: {dt*1e3:.2f} ms  {mrays:.2f} MRays/s",
          flush=True)

    # oracle spot-check: 256 random primary rays vs brute force
    from snail_tpu.ops.intersect import intersect_brute_force
    from snail_tpu.ops.traverse_pallas import camera_trace

    dist, u, v, tri, dx, dy, dz = camera_trace(scene, cam, W, H)
    rng = np.random.default_rng(0)
    sel = rng.integers(0, W * H, 256)
    o = jnp.asarray(cam.pos)[None, :]
    d = jnp.stack([dx[sel], dy[sel], dz[sel]], axis=-1)
    bd, bt, bb = intersect_brute_force(
        jnp.broadcast_to(o, d.shape), d, scene.tri_a, scene.tri_ba,
        scene.tri_ca)
    kd = np.asarray(dist[sel])
    bd = np.asarray(bd)
    both_miss = (kd >= BIG) & (bd >= BIG)
    close = np.abs(kd - bd) <= 1e-3 * np.maximum(1.0, np.abs(bd))
    ok = (both_miss | close).mean()
    print(f"oracle agreement: {ok*100:.2f}% (>= 99.5 expected)", flush=True)
    assert ok >= 0.995, ok


if __name__ == "__main__":
    main()
