"""Ablate the worklist camera kernel via SNAIL_PROF (subprocess per
config since the knob is read at import): nodma ~ scan skeleton only;
nosync adds leaf DMAs; noslab adds the bound sync; full adds culls +
drains. Compares against the walk kernel at each level."""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child():
    import jax

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
    camv = tp._cam_vec(cam, W, H, W // tp.TILE)
    rows = jax.block_until_ready(tp.shared_rows(scene.pk_tris, cam.pos))

    def timeit(fn, n=10):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n

    which = os.environ.get("WHICH", "wl")
    kb = int(os.environ.get("KB", tp.WL_BANDS))
    if which == "wl":
        wlw, blo, smm = jax.block_until_ready(tp._camera_wl_words(
            scene.lf_boxv, cam, W, H, scene.node_lo[0],
            scene.node_hi[0], kb, scene.wl_nl))
        t = timeit(lambda: tp._run_camera_wl(
            scene.pk_box, scene.wl_lnode, scene.wl_lfc, camv, rows,
            wlw, blo, smm, p, kb))
    else:
        masks = jax.block_until_ready(tp._camera_mask_words(
            scene.mk_boxv, cam, W, H, scene.node_lo[0],
            scene.node_hi[0]))
        t = timeit(lambda: tp._run_camera_ival(
            scene.pk_meta, scene.pk_box, camv, rows, masks, p))
    print(f"RESULT {which} kb={kb} prof={os.environ.get('SNAIL_PROF','-')}"
          f" : {t*1e3:.2f} ms")


def main():
    for which in ("wl", "walk"):
        for prof in ("nodma", "nosync", "noslab", ""):
            env = dict(os.environ, WHICH=which, CHILD="1")
            if prof:
                env["SNAIL_PROF"] = prof
            else:
                env.pop("SNAIL_PROF", None)
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, capture_output=True, text=True,
                               timeout=600)
            out = [l for l in r.stdout.splitlines() if "RESULT" in l]
            print(out[0] if out else f"FAIL {which} {prof}: "
                  + r.stderr[-500:])
    # band scaling
    for kb in (1, 2):
        env = dict(os.environ, WHICH="wl", CHILD="1", KB=str(kb))
        env.pop("SNAIL_PROF", None)
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True,
                           timeout=600)
        out = [l for l in r.stdout.splitlines() if "RESULT" in l]
        print(out[0] if out else f"FAIL kb={kb}: " + r.stderr[-500:])


if __name__ == "__main__":
    if os.environ.get("CHILD"):
        child()
    else:
        main()
