"""Per-stage timing of the headline bench config on the real chip.

Breaks feline 1024x1024 1-light forward into: primary-only camera trace,
shadow any-hit pass, full frame, and isolates the XLA shading cost.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, n=8):
    r = fn()
    r.block_until_ready() if hasattr(r, "block_until_ready") else [
        x.block_until_ready() for x in r
    ]
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    (r.block_until_ready() if hasattr(r, "block_until_ready") else
     [x.block_until_ready() for x in r])
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from snail_tpu.core.types import Camera, Light, RenderOpts
    from snail_tpu.render.renderer import render_frame
    from snail_tpu.scene.scene import load_scene
    from snail_tpu.ops.traverse_pallas import camera_trace, any_hit_shared
    from snail_tpu.core.vecmath import BIG

    W = H = 1024
    lights = Light.make((5.0, 15.0, 5.0), (1.0, 1.0, 1.0), 60.0)
    scene = load_scene("/root/reference/scenes/feline.obj",
                       cache_dir="/tmp/snail_dump", lights=lights)
    print("tris:", scene.num_tris, "nodes:", scene.num_nodes,
          "leaf_max:", scene.leaf_max, "depth:", scene.depth, flush=True)
    lo, hi = np.asarray(scene.node_lo[0]), np.asarray(scene.node_hi[0])
    center = (lo + hi) * 0.5
    ext = float(np.max(hi - lo))
    cam = Camera.look_at(pos=tuple(center + np.array([0.45, 0.35, 0.9]) * ext),
                         target=tuple(center))
    opts = RenderOpts(reflections=False, transparency=False, textures=False)

    # 1. primary only (camera trace kernel)
    # no closure-capturing outer jit: captured scene arrays would inline
    # as HLO constants and multiply compile time (camera_trace's internals
    # are already jitted with proper arguments)
    ct = lambda: camera_trace(scene, cam, W, H)
    t_prim = bench(lambda: ct())
    print(f"primary camera_trace: {t_prim*1e3:8.2f} ms "
          f"({W*H/t_prim/1e6:7.1f} MRays/s)", flush=True)

    # 2. shadow pass alone (using traced hit points)
    dist, u, v, tri, dx, dy, dz = ct()
    lp = lights.pos[0]
    hit = (dist > 0) & (dist < BIG)
    px = cam.pos[0] + dx * dist
    py = cam.pos[1] + dy * dist
    pz = cam.pos[2] + dz * dist
    lvx, lvy, lvz = px - lp[0], py - lp[1], pz - lp[2]
    ld = jnp.sqrt(lvx**2 + lvy**2 + lvz**2)
    sd = (lvx / ld, lvy / ld, lvz / ld)
    stm = jnp.where(hit, ld * 0.9999, -BIG)
    sd = tuple(jnp.where(hit, c, 0.5774) for c in sd)
    sh = lambda: any_hit_shared(scene, lp, sd, stm)
    t_shadow = bench(lambda: sh())
    print(f"shadow any_hit:       {t_shadow*1e3:8.2f} ms "
          f"({W*H/t_shadow/1e6:7.1f} MRays/s)", flush=True)

    # 3. full frame
    t_frame = bench(lambda: render_frame(scene, cam, W, H, opts))
    print(f"full frame:           {t_frame*1e3:8.2f} ms "
          f"({2*W*H/t_frame/1e6:7.1f} MRays/s)  "
          f"[shading+rest = {(t_frame-t_prim-t_shadow)*1e3:.2f} ms]", flush=True)

    # 4. noshading frame (primary + image assembly only)
    t_ns = bench(lambda: render_frame(scene, cam, W, H,
                                      RenderOpts(shading=False)))
    print(f"noshading frame:      {t_ns*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
