"""Doom3 .proc / materials.mtr / .list loaders on synthetic inputs
(reference src/formats/doom3_proc.cpp:10-159, src/rtracer.cpp:518-547)."""

import numpy as np
import pytest

from snail_tpu.scene.doom3 import (
    load_any,
    load_doom3_proc,
    load_list,
    load_mat2texture_map,
)

MTR = """
table fancyTable { { 0, 1, 0.5 } }
textures/base_wall/lfwall1
{
    qer_editorimage textures/base_wall/lfwall1.tga
    diffusemap map textures/base_wall/lfwall1_d
    bumpmap textures/base_wall/lfwall1_local.tga
}
textures/rock/sharprock
{
    diffusemap textures/rock/sharprock.tga
}
"""

# One model, two surfaces: a real one (2 tris) and a decal (dropped).
# Vertices are written (x z y u v nx nz ny) per the Doom3 swizzle; loader
# must emit (x, y, z) with swapped winding.
PROC = """
mapProcFile003

model { "_area0" 2

/* surface 0 */ { "textures/base_wall/lfwall1" 4 6
( 0 0 0 0 0 0 1 0 ) ( 1 0 0 1 0 0 1 0 )
( 1 0 1 1 1 0 1 0 ) ( 0 0 1 0 1 0 1 0 )
0 1 2 0 2 3
}

/* surface 1 */ { "textures/decals/splat" 3 3
( 0 5 0 0 0 0 1 0 ) ( 1 5 0 1 0 0 1 0 ) ( 1 5 1 1 1 0 1 0 )
0 1 2
}
}

interAreaPortals { 0 0 }
"""


def test_mtr_parse(tmp_path):
    p = tmp_path / "materials.mtr"
    p.write_text(MTR)
    m = load_mat2texture_map(str(p))
    # "diffusemap map <tex>" form, .tga appended when missing
    assert m["textures/base_wall/lfwall1"] == "textures/base_wall/lfwall1_d.tga"
    # "diffusemap <tex>" form, .tga kept
    assert m["textures/rock/sharprock"] == "textures/rock/sharprock.tga"
    assert "fancyTable" not in m  # table blocks skipped


def test_proc_load(tmp_path):
    (tmp_path / "materials.mtr").write_text(MTR)
    p = tmp_path / "level.proc"
    p.write_text(PROC)
    scene = load_doom3_proc(str(p))
    assert len(scene.objects) == 1
    obj = scene.objects[0]
    # decal surface dropped -> 2 tris, 4 verts
    assert obj.tri_v.shape == (2, 3)
    assert obj.verts.shape == (4, 3)
    # (x z y) -> (x, y, z): file says "1 0 1" for vert 2 => (1, 1, 0)
    np.testing.assert_allclose(obj.verts[2], [1.0, 1.0, 0.0])
    # normals swizzled the same way: (0 1 0) in-file => (0, 0, 1)
    np.testing.assert_allclose(obj.normals[0], [0.0, 0.0, 1.0])
    # winding swap: indices "0 1 2" stored as (0, 2, 1)
    np.testing.assert_array_equal(obj.tri_v[0], [0, 2, 1])
    # material mapped through the mtr -> texture name registry
    tex_names = set(scene.mat_names)
    assert "textures/base_wall/lfwall1_d.tga" in tex_names


def test_list_concat(tmp_path):
    p = tmp_path / "both.list"
    p.write_text("box.obj\nbox.obj\n")
    scene = load_list(str(p), scene_dir="/root/reference/scenes")
    from snail_tpu.scene.wavefront import load_wavefront_obj

    single = load_wavefront_obj("/root/reference/scenes/box.obj")
    assert scene.num_tris == 2 * single.num_tris


def test_load_any_dispatch(tmp_path):
    with pytest.raises(ValueError):
        load_any("scene.bin")
    obj = load_any("/root/reference/scenes/box.obj")
    assert obj.num_tris > 0
