"""Break down the worklist path: XLA leaf pass vs kernel time."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def timeit(fn, n=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from snail_tpu.core.types import Light
    from snail_tpu.ops import traverse_pallas as tp
    from snail_tpu.scene.scene import load_scene
    import bench

    lights = Light.make((5.0, 15.0, 5.0), (1.0, 1.0, 1.0), 60.0)
    scene = load_scene("/root/reference/scenes/feline.obj",
                       cache_dir="/tmp/snail_dump", lights=lights)
    cam = bench._camera_for(scene)
    W = H = 1024
    p = (W // tp.TILE) * (H // tp.TILE)
    print("leaf blocks NVL =", scene.lf_boxv.shape[1],
          "lw =", tp.max(128, tp._next_pow2(-(-scene.lf_boxv.shape[1] * 32 // 8)))
          if hasattr(tp, 'max') else '?')

    t = timeit(lambda: tp._camera_wl_words(
        scene.lf_boxv, cam, W, H, scene.node_lo[0], scene.node_hi[0],
        tp.WL_BANDS))
    print(f"camera wl words (K={tp.WL_BANDS}): {t*1e3:.2f} ms")
    t1 = timeit(lambda: tp._camera_wl_words(
        scene.lf_boxv, cam, W, H, scene.node_lo[0], scene.node_hi[0], 1))
    print(f"camera wl words (K=1): {t1*1e3:.2f} ms")

    wlw, blo, wrg = jax.block_until_ready(tp._camera_wl_words(
        scene.lf_boxv, cam, W, H, scene.node_lo[0], scene.node_hi[0],
        tp.WL_BANDS))
    print("wlw shape", wlw.shape)
    camv = tp._cam_vec(cam, W, H, W // tp.TILE)
    rows = tp.shared_rows(scene.pk_tris, cam.pos)
    t2 = timeit(lambda: tp._run_camera_wl(
        scene.pk_box, scene.wl_lnode, scene.wl_lfc, camv, rows,
        wlw, blo, wrg, p, tp.WL_BANDS))
    print(f"camera wl kernel: {t2*1e3:.2f} ms")

    # walk path for comparison
    masks = jax.block_until_ready(tp._camera_mask_words(
        scene.mk_boxv, cam, W, H, scene.node_lo[0], scene.node_hi[0]))
    t3 = timeit(lambda: tp._run_camera_ival(
        scene.pk_meta, scene.pk_box, camv, rows, masks, p))
    print(f"camera walk kernel: {t3*1e3:.2f} ms")
    t4 = timeit(lambda: tp._camera_mask_words(
        scene.mk_boxv, cam, W, H, scene.node_lo[0], scene.node_hi[0]))
    print(f"camera node masks: {t4*1e3:.2f} ms")


if __name__ == "__main__":
    main()
