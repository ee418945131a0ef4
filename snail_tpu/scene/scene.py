"""Device-resident scene: the rebuild of ``Scene<AccStruct>``
(reference src/scene.h) as a jit-friendly pytree.

Holds the flat BVH node arrays, permuted triangle SoA, shading SoA,
material table and lights as device arrays. The traversal backend
("reference" jnp while-loop vs "pallas" kernels) is a static field so the
integrator stays backend-agnostic, mirroring how the reference's
``Scene<BVH>`` vs ``Scene<DBVH>`` pick traversal at compile time.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Light, static_field
from ..bvh.build import BVH
from .base_scene import BaseScene, FlatGeometry
from .materials import MaterialTable


def _register(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    data = [f.name for f in dataclasses.fields(cls) if not f.metadata.get("static")]
    meta = [f.name for f in dataclasses.fields(cls) if f.metadata.get("static")]
    jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=meta)
    return cls


@_register
class TracedScene:
    # BVH (flat arrays, reference BVH::Node SoA-ized — bvh/tree.h:60-72)
    node_lo: jnp.ndarray
    node_hi: jnp.ndarray
    node_child: jnp.ndarray
    node_count: jnp.ndarray
    node_axis: jnp.ndarray
    node_first: jnp.ndarray
    # Triangles, permuted to leaf order (Triangle precompute, triangle.h:123-136)
    tri_a: jnp.ndarray
    tri_ba: jnp.ndarray
    tri_ca: jnp.ndarray
    # Shading triangles (ShTriangle deltas, triangle.h:181-230)
    sh_n0: jnp.ndarray
    sh_ne1: jnp.ndarray
    sh_ne2: jnp.ndarray
    sh_uv0: jnp.ndarray
    sh_uve1: jnp.ndarray
    sh_uve2: jnp.ndarray
    sh_mat: jnp.ndarray
    # Materials (SoA table)
    mat_diffuse: jnp.ndarray
    mat_specular: jnp.ndarray
    mat_emissive: jnp.ndarray
    mat_dissolve: jnp.ndarray
    mat_reflect: jnp.ndarray
    mat_flags: jnp.ndarray
    mat_difftex: jnp.ndarray
    mat_disstex: jnp.ndarray
    # Lights
    lights: Optional[Light]
    # Textures (atlas arrays; None => untextured scene)
    tex_atlas: Optional[jnp.ndarray] = None
    tex_meta: Optional[jnp.ndarray] = None
    tex_sat: Optional[jnp.ndarray] = None  # per-texture SATs (with_sat)
    # Packed kernel layouts (snail_tpu.ops.traverse_pallas): SMEM meta
    # i32[2N] + bbox f32[6N] tables, HBM tris f32[Tpad, 128].
    # None => scene exceeds the SMEM node cap; Pallas path unavailable.
    pk_meta: Optional[jnp.ndarray] = None
    pk_box: Optional[jnp.ndarray] = None
    pk_tris: Optional[jnp.ndarray] = None
    # Two-level page tables for scenes over the SMEM node cap
    # (bvh/pages.py): pk_meta/pk_box then hold the TOP tree and these the
    # HBM-resident node pages. None => single-level scene.
    pg_meta: Optional[jnp.ndarray] = None
    pg_box: Optional[jnp.ndarray] = None
    # Planar node boxes for the XLA node-mask pass (traverse_pallas
    # compute_masks): f32[6, NV, 8, 128] covering top + page-local nodes.
    mk_boxv: Optional[jnp.ndarray] = None
    # Drain-only worklist tables (traverse_pallas.pack_leaf_tables):
    # planar LEAF boxes for the per-packet XLA leaf pass + the permuted
    # leaf->node and first<<7|count SMEM tables. None => walk kernels.
    lf_boxv: Optional[jnp.ndarray] = None
    wl_lfc: Optional[jnp.ndarray] = None
    # 16 leaf boxes per 128-lane row, DMA'd per enqueue for the chunk
    # culls (pack_leaf_tables)
    wl_boxrows: Optional[jnp.ndarray] = None
    wl_nl: int = static_field(default=0)  # real (unpadded) leaf count
    # Component-planar (SoA) shading arrays for the packed fast path:
    # 16 flat (T,) arrays (n0.xyz, ne1.xyz, ne2.xyz, uv0.uv, uve1.uv,
    # uve2.uv, mat) — gathers of (T,) beat gathers of (T, 3) on TPU.
    sh_soa: Optional[tuple] = None
    # Row-packed shading/material tables: ONE 64-byte row gather per hit
    # instead of 16 scattered scalar gathers (the ShTriangle "64 B = one
    # fetch unit" idea, triangle.h:181-230, mapped to TPU gather rows).
    # sh_pack f32[T,16]: n0.xyz, e1.xyz, e2.xyz, u0,v0, du1,dv1, du2,dv2,
    # mat. mat_pack f32[M,16]: kd.xyz, ks.xyz, reflect, dissolve, difftex,
    # disstex, emissive.xyz, flags, pad.
    sh_pack: Optional[jnp.ndarray] = None
    mat_pack: Optional[jnp.ndarray] = None
    # static meta
    num_tris: int = static_field(default=0)
    num_nodes: int = static_field(default=0)
    leaf_max: int = static_field(default=8)
    depth: int = static_field(default=32)
    # does ANY material reflect / transmit? Static so the integrator can
    # skip whole bounce recursions at trace time (the reference only
    # builds reflection/transparency selectors for materials with the
    # matching flags, shading/material.h:12-17 + scene_inl.h:264-265)
    has_refl: bool = static_field(default=True)
    has_transp: bool = static_field(default=True)
    # mask-index base/stride of page-local nodes (traverse_pallas
    # build_mask_boxv): page p local n -> mk_off + p * mk_cap + n
    mk_off: int = static_field(default=0)
    mk_cap: int = static_field(default=0)
    backend: str = static_field(default="auto")  # auto | reference | pallas

    @property
    def bbox(self):
        return self.node_lo[0], self.node_hi[0]

    def with_backend(self, backend: str) -> "TracedScene":
        return dataclasses.replace(self, backend=backend)

    def with_lights(self, lights: Optional[Light]) -> "TracedScene":
        return dataclasses.replace(self, lights=lights)


def with_sat(scene: "TracedScene") -> "TracedScene":
    """Attach summed-area tables for RenderOpts(tex_filter="sat")
    (reference SATSampler, sampling/sat_sampler.h:10-57)."""
    import dataclasses

    from .textures import build_sat_atlas

    if scene.tex_atlas is None:
        return scene
    return dataclasses.replace(
        scene, tex_sat=build_sat_atlas(scene.tex_atlas, scene.tex_meta))


def make_traced_scene(
    geom: FlatGeometry,
    bvh: BVH,
    materials: Optional[MaterialTable] = None,
    lights: Optional[Light] = None,
    textures=None,
    backend: str = "auto",
    leaf_pad: int = 64,  # must cover traverse_pallas.LEAF_PAD DMA over-read
) -> TracedScene:
    """Assemble device arrays from host-built pieces.

    The triangle arrays are permuted to the BVH's leaf order (the reference
    physically reorders tris at build, bvh/tree.cpp:245-253) and padded with
    ``leaf_pad`` degenerate triangles so fixed-size leaf loads can over-read.
    """
    g = geom.permuted(bvh.order).padded(leaf_pad)
    if materials is None:
        materials = MaterialTable.build({"": 0}, [])

    leaf_max = int(bvh.count.max()) if len(bvh.count) else 1

    def dev(x):
        return jnp.asarray(x)

    tex_atlas = tex_meta = None
    if textures is not None:
        tex_atlas, tex_meta = textures

    from ..ops.traverse_pallas import (
        IVAL_LEAF,
        pack_leaf_tables,
        pack_scene_arrays,
        pack_scene_arrays_paged,
    )

    pg_meta = pg_box = mk_boxv = None
    pk_meta = pk_box = pk_tris = None
    lf_boxv = wl_lfc = wl_boxrows = None
    wl_nl = 0
    mk_off = mk_cap = 0

    def _pack_wl():
        nonlocal lf_boxv, wl_lfc, wl_boxrows, wl_nl
        if leaf_max <= IVAL_LEAF:
            wl = pack_leaf_tables(bvh)
            if wl is not None:
                lf_boxv, wl_lfc, wl_boxrows = (dev(wl[0]), dev(wl[1]),
                                               dev(wl[2]))
                wl_nl = wl[3]

    try:
        pk_meta, pk_box, pk_tris, mk_boxv, mk_off = pack_scene_arrays(
            bvh, g)
        pk_meta, pk_box, pk_tris = dev(pk_meta), dev(pk_box), dev(pk_tris)
        mk_boxv = dev(mk_boxv)
        _pack_wl()
    except ValueError:
        _pack_wl()
        # the worklist kernels need only the leaf tables + triangle
        # rows; the two-level paged layout exists as the SNAIL_WL=0
        # fallback and its host partition is kept only where it is
        # affordable (thai-class scenes would spend minutes of
        # interpreter time in partition_pages for tables the worklist
        # path never touches)
        if bvh.num_nodes <= 300_000:
            try:  # over the SMEM node cap: two-level page layout
                (pk_meta, pk_box, pk_tris, pg_meta, pg_box, mk_boxv,
                 mk_off, mk_cap) = pack_scene_arrays_paged(bvh, g)
                pk_meta, pk_box = dev(pk_meta), dev(pk_box)
                pk_tris = dev(pk_tris)
                pg_meta, pg_box = dev(pg_meta), dev(pg_box)
                mk_boxv = dev(mk_boxv)
            except ValueError:
                pk_meta = pk_box = pk_tris = None  # jnp fallback
        if pk_tris is None and wl_lfc is not None:
            from ..ops.traverse_pallas import _pack_tri_rows

            pk_tris = dev(_pack_tri_rows(g))
        if wl_lfc is None and pk_meta is None:
            pk_tris = None  # jnp fallback

    sh_soa = tuple(
        dev(np.ascontiguousarray(arr[:, k]))
        for arr, width in ((g.n0, 3), (g.n_e1, 3), (g.n_e2, 3),
                           (g.uv0, 2), (g.uv_e1, 2), (g.uv_e2, 2))
        for k in range(width)
    ) + (dev(g.mat_id),)

    m = len(materials.diffuse)
    mat_pack = np.zeros((m, 16), np.float32)
    mat_pack[:, 0:3] = materials.diffuse
    mat_pack[:, 3:6] = materials.specular
    mat_pack[:, 6] = materials.reflectivity
    mat_pack[:, 7] = materials.dissolve
    mat_pack[:, 8] = materials.diffuse_tex.astype(np.float32)
    mat_pack[:, 9] = materials.dissolve_tex.astype(np.float32)
    mat_pack[:, 10:13] = materials.emissive
    mat_pack[:, 13] = materials.flags.astype(np.float32)

    t = len(g.a)
    # 32-wide rows: shading deltas (0:16) + the triangle's material row
    # DENORMALIZED into 16:32, so the fast path fetches everything a hit
    # needs in ONE row gather (the ShTriangle one-fetch idea taken one
    # step further; 1M-row gathers are the XLA-side bottleneck on TPU).
    sh_pack = np.zeros((t, 32), np.float32)
    sh_pack[:, 0:3] = g.n0
    sh_pack[:, 3:6] = g.n_e1
    sh_pack[:, 6:9] = g.n_e2
    sh_pack[:, 9:11] = g.uv0
    sh_pack[:, 11:13] = g.uv_e1
    sh_pack[:, 13:15] = g.uv_e2
    sh_pack[:, 15] = g.mat_id.astype(np.float32)
    sh_pack[:, 16:32] = mat_pack[np.clip(g.mat_id, 0, m - 1)]

    return TracedScene(
        node_lo=dev(bvh.node_lo),
        node_hi=dev(bvh.node_hi),
        node_child=dev(bvh.child),
        node_count=dev(bvh.count),
        node_axis=dev(bvh.axis),
        node_first=dev(bvh.first_node),
        tri_a=dev(g.a),
        tri_ba=dev(g.ba),
        tri_ca=dev(g.ca),
        sh_n0=dev(g.n0),
        sh_ne1=dev(g.n_e1),
        sh_ne2=dev(g.n_e2),
        sh_uv0=dev(g.uv0),
        sh_uve1=dev(g.uv_e1),
        sh_uve2=dev(g.uv_e2),
        sh_mat=dev(g.mat_id),
        mat_diffuse=dev(materials.diffuse),
        mat_specular=dev(materials.specular),
        mat_emissive=dev(materials.emissive),
        mat_dissolve=dev(materials.dissolve),
        mat_reflect=dev(materials.reflectivity),
        mat_flags=dev(materials.flags),
        mat_difftex=dev(materials.diffuse_tex),
        mat_disstex=dev(materials.dissolve_tex),
        lights=lights,
        tex_atlas=tex_atlas,
        tex_meta=tex_meta,
        pk_meta=pk_meta,
        pk_box=pk_box,
        pk_tris=pk_tris,
        pg_meta=pg_meta,
        pg_box=pg_box,
        mk_boxv=mk_boxv,
        lf_boxv=lf_boxv,
        wl_lfc=wl_lfc,
        wl_boxrows=wl_boxrows,
        wl_nl=wl_nl,
        sh_soa=sh_soa,
        sh_pack=dev(sh_pack),
        mat_pack=dev(mat_pack),
        has_refl=bool(np.any(np.asarray(materials.reflectivity) > 0.0)),
        has_transp=bool(np.any(np.asarray(materials.dissolve) < 1.0)),
        num_tris=geom.num_tris,
        num_nodes=bvh.num_nodes,
        leaf_max=leaf_max,
        depth=bvh.depth,
        mk_off=mk_off,
        mk_cap=mk_cap,
        backend=backend,
    )


def _load_geom_cached(obj_path, cache_dir, flip_normals, gen_normals):
    """OBJ parse with a flattened-geometry npz cache beside the BVH cache
    (the reference's dump/ idea extended to the parse step — OBJ text
    parsing dominated warm startup). Returns (FlatGeometry, BaseScene or
    None). A cache hit skips the text parse entirely; material names and
    mtl libs are stored alongside."""
    import dataclasses as _dc
    import json as _json
    import os

    import numpy as _np

    from .base_scene import FlatGeometry
    from .wavefront import load_wavefront_obj

    st = os.stat(obj_path)
    key = f"{st.st_size}:{int(st.st_mtime)}:{flip_normals}:{gen_normals}:g1"
    path = None
    if cache_dir:
        name = os.path.splitext(os.path.basename(obj_path))[0]
        path = os.path.join(cache_dir, f"{name}.geom.npz")
        if os.path.exists(path):
            try:
                z = _np.load(path, allow_pickle=False)
                if str(z["key"]) == key:
                    fields = [f.name for f in _dc.fields(FlatGeometry)]
                    geom = FlatGeometry(**{f: z[f] for f in fields})
                    meta = _json.loads(str(z["meta"]))
                    base = _CachedBaseMeta(meta["mat_names"],
                                           meta["mtl_libs"])
                    return geom, base
            except Exception:
                pass
    base = load_wavefront_obj(obj_path)
    if flip_normals:
        base.flip_normals()
    if gen_normals:
        base.gen_normals()
    geom = base.flatten()
    if path:
        import dataclasses as _dc2

        os.makedirs(cache_dir, exist_ok=True)
        _np.savez(
            path,
            key=key,
            meta=_json.dumps({"mat_names": base.mat_names,
                              "mtl_libs": base.mtl_libs}),
            **{f.name: getattr(geom, f.name)
               for f in _dc2.fields(FlatGeometry)},
        )
    return geom, base


class _CachedBaseMeta:
    """Stand-in for BaseScene when geometry comes from the npz cache —
    only the loader metadata the rest of load_scene touches."""

    def __init__(self, mat_names, mtl_libs):
        self.mat_names = mat_names
        self.mtl_libs = mtl_libs


def load_scene(
    obj_path: str,
    mtl_path: Optional[str] = None,
    tex_dir: Optional[str] = None,
    cache_dir: Optional[str] = "dump",
    flip_normals: bool = True,
    gen_normals: bool = True,
    lights: Optional[Light] = None,
    backend: str = "auto",
    leaf_size: int = 32,  # hardware-scanned optimum (feline 1024^2:
    # 33.5 ms vs 35.9 at 16, 36.0 at 64): halving the node count buys
    # more walk time than the extra VPU tri tests cost; must stay
    # <= traverse_pallas.IVAL_LEAF for the decoupled kernel path
) -> TracedScene:
    """One-call scene load: the rtracer startup path
    (rtracer.cpp:518-587: load OBJ -> FlipNormals -> GenNormals ->
    BVH::Construct -> materials/textures -> UpdateMaterialIds)."""
    import os

    from ..bvh.cache import build_or_load
    from .wavefront import load_wavefront_obj
    from .materials import load_material_descs, MaterialTable
    from .lights import default_scene_lights

    geom, base = _load_geom_cached(obj_path, cache_dir, flip_normals,
                                   gen_normals)
    lo, hi = geom.bounds()
    name = os.path.splitext(os.path.basename(obj_path))[0]
    method = os.environ.get("SNAIL_BVH_METHOD", "binned")
    bvh = build_or_load(
        lo, hi, cache_dir=cache_dir, name=name, leaf_size=leaf_size,
        method=method,
    )

    descs = []
    if mtl_path is None:
        for lib in base.mtl_libs:
            cand = os.path.join(os.path.dirname(obj_path), lib)
            if os.path.exists(cand):
                mtl_path = cand
                break
    if mtl_path and os.path.exists(mtl_path):
        descs = load_material_descs(mtl_path)

    textures = None
    tex_ids = {}
    if tex_dir and descs:
        from .textures import load_texture_atlas

        textures, tex_ids = load_texture_atlas(descs, tex_dir)

    mats = MaterialTable.build(base.mat_names, descs, tex_ids)
    if lights is None:
        lights = default_scene_lights(lo.min(axis=0), hi.max(axis=0))
    return make_traced_scene(
        geom, bvh, mats, lights, textures, backend=backend
    )
