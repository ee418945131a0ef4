"""Golden-image regression (the compare_img workflow, tools/compare_img.cpp
:15-29 + the reference's `k`-key output.tga dumps, rtracer.cpp:240-243).

The reference binaries can't be built (libfwk is an empty submodule), so the
goldens are OUR pinned renders: fixed scenes/cameras/options rendered through
the portable (jnp) path, committed as small PNGs.  Perf work on the kernels
cannot silently change output — both the jnp path and the Pallas interpret
path must keep matching these within 1 uint8 LSB.

Regenerate (only for a deliberate, reviewed change of shading semantics):
    python tests/test_golden.py regen
"""

import os

import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _scenes():
    from snail_tpu.bvh import build_bvh
    from snail_tpu.core.types import Camera, Light, RenderOpts
    from snail_tpu.scene.procedural import cornell_scene
    from snail_tpu.scene.scene import load_scene, make_traced_scene

    out = []

    # 1. box.obj — loader + full Whitted with shadows (config 1 analogue)
    scene = load_scene("/root/reference/scenes/box.obj",
                       cache_dir="/tmp/snail_dump", backend="reference")
    cam = Camera.look_at(pos=(3.0, 2.5, 4.0), target=(0.0, 0.0, 0.0))
    opts = RenderOpts(reflections=False, transparency=False, textures=False)
    out.append(("box64", scene, cam, opts, 64, 64))

    # 2. procedural cornell — reflections + transparency exercise bounces
    from snail_tpu.core.types import Light

    base = cornell_scene()
    g = base.flatten()
    lo, hi = g.bounds()
    bvh = build_bvh(lo, hi, leaf_size=8)
    lights = Light.make((0.0, 3.5, 0.0), (1.0, 0.9, 0.8), 30.0)
    cscene = make_traced_scene(g, bvh, lights=lights, backend="reference")
    ccam = Camera.look_at(pos=(0.0, 2.0, 6.0), target=(0.0, 1.5, 0.0))
    copts = RenderOpts(textures=False)
    out.append(("cornell64", cscene, ccam, copts, 64, 64))
    return out


def _render(scene, cam, opts, w, h):
    from snail_tpu.render.renderer import render_frame, to_rgb8

    return to_rgb8(render_frame(scene, cam, w, h, opts))


@pytest.mark.parametrize("idx", [0, 1])
def test_golden_images(idx):
    from snail_tpu.utils.image import load_image

    name, scene, cam, opts, w, h = _scenes()[idx]
    path = os.path.join(GOLD, f"{name}.png")
    assert os.path.exists(path), f"golden missing: {path} (run regen)"
    golden = (load_image(path) * 255.0).round().astype(np.int16)
    img = _render(scene, cam, opts, w, h).astype(np.int16)
    diff = np.abs(img - golden)
    # float->uint8 truncation may flip one LSB across compilers/backends
    assert diff.max() <= 1, (
        f"{name}: max err {diff.max()} LSB, "
        f"{(diff.max(axis=-1) > 1).mean():.4f} of pixels off"
    )


def regen():
    os.makedirs(GOLD, exist_ok=True)
    from snail_tpu.utils.image import save_image

    for name, scene, cam, opts, w, h in _scenes():
        img = _render(scene, cam, opts, w, h)
        save_image(os.path.join(GOLD, f"{name}.png"), img)
        print("wrote", name, img.shape, img.mean())


if __name__ == "__main__":
    import sys

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        regen()
