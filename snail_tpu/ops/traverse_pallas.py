"""Pallas TPU packet-traversal kernels (closest-hit + any-hit shadow).

This is the TPU-native heart of the framework — the rebuild of the
reference's SSE packet traversal (src/bvh/traverse.cpp) and of its Cell SPU
kernel design (src/spu/trace.cpp), mapped onto the TPU memory hierarchy:

  reference                         ->  here
  ------------------------------------------------------------------
  RayGroup 256-ray packet              one kernel grid instance owns a
  (64 quads, QuadLevels=3)             PACKET_R=4096-ray (64x64 px) tile:
                                       each ray component is a (32, 128)
                                       block (4 vregs), amortizing the
                                       per-packet scalar walk and sync
                                       stalls over 4x the rays
  RayGroup<sharedOrigin=1> template    camera-fused primary kernel: ray
  specialization + RayGenerator        dirs are generated INSIDE the
  (ray_group.h:74-110,                 kernel from SMEM camera scalars
  ray_generator.cpp:23-50)             (zero HBM ray input); shadow kernel
                                       takes the light as its shared
                                       origin the same way
  per-packet traversal stack           int32 stack in SMEM scratch
  (StackElem[maxDepth+2])              (traverse.cpp:17)
  RayGroup<sharedOrigin> Moller        shared_rows: per-frame XLA precompute
  specialization                       of the origin-dependent Moller terms
                                       (tv x ca, ba x tv, tv.n) per triangle
                                       -> ~15 VPU ops per ray-tri in-kernel
  32-byte BVH node (tree.h:60-72)      32-byte SMEM node, split tables:
                                       meta i32[2N] + f32 bbox[6N] (no
                                       dequant work in the hot loop)
  per-node interval + per-ray slab     one vectorized slab test over all
  tests + [first,last] narrowing       packet rays (VPU lanes replace the
  (bounding_box.cpp:62-142)            narrowing loop); any() -> descend
  near-child via firstNode ^           identical; per-packet sign bits of
  sign[axis] (traverse.cpp:71-74)      ray 0 in SMEM
  SPU DMA triangle cache               leaf triangle blocks DMA'd
  (spu/base.h:85-135)                  HBM->VMEM per leaf visit
  MultiCollide 4-triangle unroll       4 triangles on a leading axis:
  (spu/triangle.h:23-38)               one (4, 8, 128) intersection
                                       evaluates 4 tris x 1024 rays
  shadow early full-occlusion exit     jnp.all(blocked) clears the stack
  (traverse.cpp:117-121)

Why SMEM for the tree: Mosaic has no dynamic scalar loads from VMEM, and
traversal is scalar control flow — the tree must live where the scalar
core can randomly index it. The tables are STAGED into persistent SMEM
scratch once per launch (_stage_tables; SMEM-space pallas inputs are
re-filled every grid step, ~37 us/packet measured). SMEM is ~1 MB on
this chip (tools/probe_smem.py), capping a single-level tree at
SMEM_NODE_CAP nodes; bigger scenes take the two-level paged layout
(bvh/pages.py) whose node pages are DMA'd into a persistent
direct-mapped SMEM cache on demand.

Node culling is mask-driven: one dense XLA pass per wavefront
(compute_masks) interval-tests EVERY node — top tree and page-local
alike — against each packet's ray-interval bounds and bit-packs the
verdicts; each kernel grid step DMAs its packet's few-KB mask row into
SMEM and the walk reads ~10-op bits instead of running ~45-op scalar
interval tests twice per pop.

All wavefront IO is component-planar ``(P, 32, 128)`` float32 — AoS (R, 3)
arrays would force lane-crossing transposes that cost more than the
traversal itself (measured 13 ms per 1M rays). Packet size is a measured
optimum: 32x32 px (1 vreg) pays ~2x in per-packet walk+sync overhead;
128x128 px (16 vregs) pays ~1.7x in divergence-amplified intersections.

Triangle HBM layout: ``tris (Tpad, 128) f32`` rows = [a(3), ba(3), ca(3),
nrm(3), pad(116)] — a full 128-lane row per triangle (Mosaic DMA slices
need a 128-multiple lane dim), padded so any leaf DMA of LEAF_PAD rows
stays in bounds.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.vecmath import BIG

# Tunables (env-overridable for perf scans; defaults are the measured
# optimum on feline 1024^2, see tools/scan_params.py).
RAY_SUB = int(os.environ.get("SNAIL_RAY_SUB", 32))  # packet sublane rows
RAY_LANE = 128  # packet lane dim
PACKET_R = RAY_SUB * RAY_LANE  # rays per packet
TILE = {8: 32, 32: 64, 128: 128}[RAY_SUB]  # square pixel tile per packet
STACK_CAP = 96  # maxDepth(64) + slack (reference uses maxDepth+2)
LEAF_PAD = 64  # leaf DMA granule (rows); builder leaf_size must be <= this
IVAL_LEAF = int(os.environ.get("SNAIL_IVAL_LEAF", 32))  # interval-kernel
# leaf granule; the counters (tools/measure_counters.py) show the walk is
# scalar-bound, so leaf size trades scalar node visits vs VPU tri tests
NBUF = int(os.environ.get("SNAIL_NBUF", 24))  # leaf DMA ring slots
# (latency hiding, spu/base.h:85-135 analogue); also the chunk size of the
# one vector<->scalar sync, so bigger rings mean fewer sync stalls
QR = min(int(os.environ.get("SNAIL_QR", 16)), RAY_SUB)  # quarter rows:
# sub-packet granule for per-leaf ray masking — leaves usually cover a
# fraction of the pixel tile, so intersections run only on the row blocks
# whose slab test passed. Hardware scan (round 4): QR=8 (one vreg, the
# finest maskable granule) measured 26.8 ms vs 18.7 at QR=16 on feline
# 1024^2 — the per-drain fixed cost (predicated region setup in the
# dynamic survivor loop) outweighs the halved wasted rays, so 16 stays.
# Clamped to RAY_SUB so the SNAIL_RAY_SUB=8 config keeps NQ >= 1.
NQ = RAY_SUB // QR  # quarters per packet
# Square-quadrant ray order: ray k of a packet maps to a 32x32-pixel
# quadrant q = k >> 10 and raster position (k%1024 -> (iy, ix)) inside it,
# instead of TILE-wide raster rows. One (8, 128) vreg = one 32x32 pixel
# square (vs a 64x16 strip), so per-quadrant leaf culls waste ~2x fewer
# rays on the typical small leaf footprint. QX = quadrants per tile row.
QX = TILE // 32
_QX_SHIFT = QX.bit_length() - 1
# Drain strategy A/B (perf scans): "quarter" = scalar-compacted dynamic
# loop over surviving (leaf, quarter) pairs; "leaf" = static per-leaf
# pl.when over whole packets (the round-1 structure).
_DRAIN = os.environ.get("SNAIL_DRAIN", "quarter")
# Walk v2 (flat scenes): leaves are enqueued directly from their parent
# (their leaf-ness and counts ride the parent's w1 bits, see
# pack_scene_arrays) so the stack only ever holds inner nodes — pops
# cost ~180 scalar cycles each (round-4 ablations: the walk was 11 ms of
# an 18.7 ms frame) and leaf pops were ~40%% of them.
_WALK2 = os.environ.get("SNAIL_WALK2", "1") != "0"
_NQ_SHIFT = NQ.bit_length() - 1  # log2(NQ) for the drain's slot decode
_BITS_WORDS = (NBUF * NQ + 31) // 32  # quarter-bit words per chunk
assert 32 % NQ == 0, "leaf quarter bits must not straddle words"
TRI_ROW = 128  # floats per triangle row (lane-aligned for DMA slicing)
SMEM_NODE_CAP = 24576  # 32 B/node; box f32[6N]+meta i32[2N] ~ 768 KB SMEM


# Ablation knob for perf budgeting (tools/profile_bench.py): "nodrain"
# skips leaf intersections (walk + culls + DMA + syncs remain), "noslab"
# additionally skips the per-chunk vector culls. Never set in production.
_PROF = os.environ.get("SNAIL_PROF", "")


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


# ---------------------------------------------------------------------------
# Packing (host side)
# ---------------------------------------------------------------------------


def pack_scene_arrays(bvh, geom_padded):
    """Pack BVH + triangles into kernel layouts.

    Returns (meta i32[2N], box f32[6N], tris f32[Tpad, 128]).

    meta[2n]   = child<<9 | count<<2 | axis  (leaf: count>0, child=first tri)
    meta[2n+1] = firstNode bit (reference Node::firstNode, tree.h:60-72)
                 | left_leaf<<1 | right_leaf<<2
                 | left_count<<3 | right_count<<10
                 (inner nodes only: the children's leaf-ness and counts
                 ride the parent's spare w1 bits so the flat walk can
                 enqueue leaf children directly without ever pushing,
                 popping, or re-reading them — pops were ~180 cycles each
                 and leaves were ~40% of them, round-4 ablations)
    box[6n:6n+6] = lo.xyz, hi.xyz as raw f32 — no quantization; SMEM is
    large enough (~1 MB) and the dequant ALU was hot-loop scalar work.
    """
    n = len(bvh.child)
    if n > SMEM_NODE_CAP:
        raise ValueError(
            f"BVH has {n} nodes > SMEM cap {SMEM_NODE_CAP}; rebuild with a "
            f"larger leaf_size (pallas path) or use the reference backend"
        )
    if int(bvh.count.max()) > LEAF_PAD:
        raise ValueError(
            f"leaf count {bvh.count.max()} exceeds LEAF_PAD {LEAF_PAD}"
        )
    assert (bvh.child < (1 << 22)).all(), "scene too large for 22-bit ids"
    assert LEAF_PAD <= 127, "child counts must fit 7 bits of w1"

    w0 = (
        (bvh.child.astype(np.uint32) << 9)
        | ((bvh.count.astype(np.uint32) & 0x7F) << 2)
        | (bvh.axis.astype(np.uint32) & 0x3)
    )
    w1 = bvh.first_node.astype(np.uint32) & 1
    inner = bvh.count == 0
    li = bvh.child[inner]  # left child ids (right = li + 1)
    lw = np.zeros_like(w1[inner])
    lw |= ((bvh.count[li] > 0).astype(np.uint32)) << 1
    lw |= ((bvh.count[li + 1] > 0).astype(np.uint32)) << 2
    lw |= (bvh.count[li].astype(np.uint32) & 0x7F) << 3
    lw |= (bvh.count[li + 1].astype(np.uint32) & 0x7F) << 10
    w1[inner] |= lw
    meta = np.stack([w0, w1], axis=1).astype(np.uint32)
    meta = meta.reshape(-1).view(np.int32)

    box = np.concatenate(
        [bvh.node_lo.astype(np.float32), bvh.node_hi.astype(np.float32)],
        axis=1,
    ).reshape(-1)

    mk_boxv, mk_off = build_mask_boxv(box)
    return meta, box, _pack_tri_rows(geom_padded), mk_boxv, mk_off


def _pack_tri_rows(geom_padded):
    t = len(geom_padded.a)
    # One triangle per 128-float row: Mosaic requires DMA-sliced arrays to
    # have a 128-multiple lane dimension, so the 16 used floats live in the
    # first lanes of a full 128-lane row (bandwidth cost revisited later).
    tris = np.zeros((t, TRI_ROW), np.float32)
    tris[:, 0:3] = geom_padded.a
    tris[:, 3:6] = geom_padded.ba
    tris[:, 6:9] = geom_padded.ca
    tris[:, 9:12] = np.cross(geom_padded.ba, geom_padded.ca)
    return tris


def pack_scene_arrays_paged(bvh, geom_padded):
    """Two-level packing for scenes over the SMEM node cap
    (bvh/pages.py): returns (top_meta, top_box, tris, pg_meta, pg_box).

    Requires leaf_max <= IVAL_LEAF (only the decoupled interval kernels
    have a paged variant)."""
    from ..bvh.pages import partition_pages

    if int(bvh.count.max()) > IVAL_LEAF:
        raise ValueError(
            f"paged path needs leaf_size <= IVAL_LEAF ({IVAL_LEAF}); "
            f"got {bvh.count.max()}"
        )
    layout = partition_pages(bvh)
    if layout.n_top > SMEM_NODE_CAP:
        raise ValueError(
            f"top tree {layout.n_top} nodes > SMEM cap {SMEM_NODE_CAP}"
        )
    pm, pb = page_kernel_layout(layout.pg_meta, layout.pg_box)
    mk_boxv, mk_off = build_mask_boxv(layout.top_box, pb,
                                      layout.page_cap)
    return (layout.top_meta, layout.top_box, _pack_tri_rows(geom_padded),
            pm, pb, mk_boxv, mk_off, layout.page_cap)


def _next_pow2(x: int) -> int:
    return 1 << (int(x) - 1).bit_length()


def build_mask_boxv(bvh_box6, pg_box=None, page_cap=None):
    """Host-side planar node boxes for the XLA mask pass.

    Page p's local node n has mask index page_off + p * page_cap + n in
    the flat mask node space (the kernels thread the same values as
    mk_off/mk_cap).

    Returns (mk_boxv f32[6, NV, 8, 128], page_off int): node (mask index)
    i lives at [:, i>>10, (i>>7)&7, i&127]. Top-tree nodes come first
    (index == node id); page-local nodes follow at
    page_off + p*page_cap + n (page_off = top count rounded to 1024 so
    pages start on a block boundary).

    ``bvh_box6``: flat f32[6*Ntop] (lo.xyz|hi.xyz per node);
    ``pg_box``:   optional kernel-layout page boxes (NP, 8, L8)."""
    top = np.asarray(bvh_box6, np.float32).reshape(-1, 6)
    nt = len(top)
    page_off = -(-nt // 1024) * 1024
    if pg_box is None:
        total = page_off if nt else 1024
        flat = np.zeros((total, 6), np.float32)
        flat[:nt] = top
        # nodes past the real count must never pass the interval test
        flat[nt:, 0:3] = 1e30
        flat[nt:, 3:6] = -1e30
    else:
        pg = np.asarray(pg_box, np.float32)
        np_pages = pg.shape[0]
        pgflat = pg.reshape(np_pages, -1)[:, : 6 * page_cap]
        pgflat = pgflat.reshape(np_pages, page_cap, 6)
        total = page_off + -(-np_pages * page_cap // 1024) * 1024
        flat = np.zeros((total, 6), np.float32)
        flat[:nt] = top
        flat[nt:page_off, 0:3] = 1e30
        flat[nt:page_off, 3:6] = -1e30
        flat[page_off : page_off + np_pages * page_cap] = pgflat.reshape(
            -1, 6)
        # slots between the top tree and the page region are made
        # never-pass. WITHIN-page padding slots keep their zero boxes
        # (degenerate at the origin, which CAN pass the interval test):
        # that is safe because page-local walks only visit ids inside
        # the page's real subtree, so those bits are never read — the
        # kernel-layout pg_box gives no per-page node count to tighten
        # them with
        used = np.zeros(total, bool)
        used[:nt] = True
        used[page_off : page_off + np_pages * page_cap] = True
        flat[~used, 0:3] = 1e30
        flat[~used, 3:6] = -1e30
    nv = total // 1024
    mk = flat.T.reshape(6, nv, 8, 128)
    return np.ascontiguousarray(mk), page_off


def page_kernel_layout(pg_meta, pg_box):
    """(NP, L) page tables -> (NP, 8, Lp/8) kernel layout.

    One page = (8, L/8): a whole-page DMA then slices only the UNTILED
    major dim (Mosaic rejects single-row slices of a (NP, L) table —
    dim 0 would carry the (8, 128) sublane tiling). Lane dims are padded
    to powers of two so the in-kernel flat->2D index split (_pg_rd) is
    shift+mask, and to >= 128 lanes because Mosaic requires sliced-copy
    shapes lane-aligned to the (8, 128) tiling even for SMEM destinations
    (hardware-verified in tools/probe_dma.py: (NP, 8, 64) slices are
    rejected, (NP, 8, 128) compile — the round-3 paged-test compile
    failure at tiny page_cap)."""
    np_, ml = pg_meta.shape
    bl = pg_box.shape[1]
    mlp = max(_next_pow2(-(-ml // 8)), 128) * 8
    blp = max(_next_pow2(-(-bl // 8)), 128) * 8
    pm = np.zeros((np_, mlp), pg_meta.dtype)
    pm[:, :ml] = pg_meta
    pb = np.zeros((np_, blp), pg_box.dtype)
    pb[:, :bl] = pg_box
    return pm.reshape(np_, 8, mlp // 8), pb.reshape(np_, 8, blp // 8)


def _pg_rd(ref, row0, i):
    """Scalar read of flat element i from cache rows [row0, row0+8)."""
    l8 = ref.shape[1]
    sh = l8.bit_length() - 1
    return ref[row0 + jax.lax.shift_right_logical(i, sh), i & (l8 - 1)]


def _pg_box6(ref, row0, node):
    b = node * 6
    return tuple(_pg_rd(ref, row0, b + k) for k in range(6))


# ---------------------------------------------------------------------------
# Kernel helpers
# ---------------------------------------------------------------------------


def _meta(tbl_ref, node):
    """Scalar meta unpack: (child, count, axis, fnode)."""
    w0 = tbl_ref[node * 2]
    fnode = tbl_ref[node * 2 + 1] & 1  # w1 carries packed child info too
    child = jax.lax.shift_right_logical(w0, 9)
    count = jax.lax.shift_right_logical(w0, 2) & 0x7F
    axis = w0 & 0x3
    return child, count, axis, fnode


def _box(box_ref, node):
    b = node * 6
    return (
        (box_ref[b], box_ref[b + 1], box_ref[b + 2]),
        (box_ref[b + 3], box_ref[b + 4], box_ref[b + 5]),
    )


def _slab_mask(o, idir, lo, hi, best):
    """Slab test of one box vs the whole (8, 128) packet -> (8, 128) bool.

    The vectorized BBox::Test (bounding_box.cpp:62-142) with the
    current-distance cull; VPU lanes replace the [first,last] narrowing."""
    t10 = (lo[0] - o[0]) * idir[0]
    t20 = (hi[0] - o[0]) * idir[0]
    t11 = (lo[1] - o[1]) * idir[1]
    t21 = (hi[1] - o[1]) * idir[1]
    t12 = (lo[2] - o[2]) * idir[2]
    t22 = (hi[2] - o[2]) * idir[2]
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t10, t20), jnp.minimum(t11, t21)),
        jnp.minimum(t12, t22),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t10, t20), jnp.maximum(t11, t21)),
        jnp.maximum(t12, t22),
    )
    return (tn <= tf) & (tf > 0.0) & (tn < best)


def _slab_any(o, idir, lo, hi, best):
    return jnp.any(_slab_mask(o, idir, lo, hi, best))


def _tri_cols(ts, r0):
    """Static (4, 1, 1) component slices of the staged leaf block."""
    return [ts[r0 : r0 + 4, j : j + 1][..., None] for j in range(12)]


@jax.jit
def shared_rows(tris, origin):
    """Per-frame shared-origin triangle table.

    For a shared ray origin ``o`` (the camera for primaries,
    ray_group.h:74-110; the light for shadow rays, scene_inl.h:127-129)
    every origin-dependent term of the Moller test is a per-TRIANGLE
    constant: tv = o - a, c1 = tv x ca, c2 = ba x tv, tmul = -(tv . n).
    Precomputing them once per frame in XLA cuts the in-kernel cost from
    ~35 to ~15 VPU ops per ray-triangle — the TPU analogue of the
    reference's RayGroup<sharedOrigin=1> template specialization.

    tris: (Tpad, TRI_ROW) rows [a, ba, ca, n, ...] ->
    rows [n(0:3), c1(3:6), c2(6:9), tmul(9), 0...].
    """
    a = tris[:, 0:3]
    ba = tris[:, 3:6]
    ca = tris[:, 6:9]
    n = tris[:, 9:12]
    tv = jnp.asarray(origin, jnp.float32)[None, :] - a
    c1 = jnp.cross(tv, ca)
    c2 = jnp.cross(ba, tv)
    tmul = -jnp.sum(tv * n, axis=1, keepdims=True)
    pad = jnp.zeros((tris.shape[0], TRI_ROW - 10), jnp.float32)
    return jnp.concatenate([n, c1, c2, tmul, pad], axis=1)


def _intersect4_sh(d, cols):
    """Shared-origin 4-triangle intersection: 9 madds + broadcast tmul
    (origin terms live in the precomputed table, see shared_rows)."""
    nx, ny, nz, c1x, c1y, c1z, c2x, c2y, c2z, tm = cols
    dx, dy, dz = d[0][None], d[1][None], d[2][None]
    det = dx * nx + dy * ny + dz * nz
    u = dx * c1x + dy * c1y + dz * c1z
    v = dx * c2x + dy * c2y + dz * c2z
    return det, u, v, jnp.broadcast_to(tm, det.shape)


def _tri_cols_sh(ts, r0):
    """Static (4, 1, 1) component slices of a shared-origin leaf block."""
    return [ts[r0 : r0 + 4, j : j + 1][..., None] for j in range(10)]


def _intersect4(o, d, cols):
    """4 triangles x 1024 rays, (4, 8, 128) vectorized (MultiCollide
    analogue, spu/triangle.h:23-38).

    Returns (det, u, v, tmul) raw values (caller applies side rules)."""
    def _b(c):  # (8,128) ray planes broadcast against the (4,1,1) tris;
        # scalar components (shared origin) broadcast as-is
        return c[None] if getattr(c, "ndim", 0) == 2 else c

    ax, ay, az, bax, bay, baz, cax, cay, caz, nx, ny, nz = cols
    ox, oy, oz = _b(o[0]), _b(o[1]), _b(o[2])
    dx, dy, dz = _b(d[0]), _b(d[1]), _b(d[2])
    tvx = ox - ax
    tvy = oy - ay
    tvz = oz - az
    det = dx * nx + dy * ny + dz * nz
    tmul = -(tvx * nx + tvy * ny + tvz * nz)
    u = (
        dx * (tvy * caz - tvz * cay)
        + dy * (tvz * cax - tvx * caz)
        + dz * (tvx * cay - tvy * cax)
    )
    v = (
        dx * (bay * tvz - baz * tvy)
        + dy * (baz * tvx - bax * tvz)
        + dz * (bax * tvy - bay * tvx)
    )
    return det, u, v, tmul


def _pixel_xy(tx, ty):
    """In-kernel pixel coordinates of every packet ray, square-quadrant
    order: ray k -> 32x32-pixel quadrant (k >> 10), raster inside it.
    Keeps every (8, 128) vreg block a square pixel footprint so the
    per-quadrant leaf culls track leaf bbox projections tightly."""
    k = (
        jax.lax.broadcasted_iota(jnp.int32, (RAY_SUB, RAY_LANE), 0) * RAY_LANE
        + jax.lax.broadcasted_iota(jnp.int32, (RAY_SUB, RAY_LANE), 1)
    )
    q = jax.lax.shift_right_logical(k, 10)
    i = k & 1023
    px = tx * TILE + jnp.left_shift(q & (QX - 1), 5) + (i & 31)
    py = (
        ty * TILE
        + jnp.left_shift(jax.lax.shift_right_logical(q, _QX_SHIFT), 5)
        + jax.lax.shift_right_logical(i, 5)
    )
    return px.astype(jnp.float32), py.astype(jnp.float32)


def kernel_ray_index(width: int, height: int) -> np.ndarray:
    """Host-side map: kernel packet-order ray r -> flat pixel index
    py * width + px (the inverse of the in-kernel _pixel_xy order).
    Used by tests and by callers that need to compare against raster-order
    oracles."""
    tiles_x = width // TILE
    p = tiles_x * (height // TILE)
    k = np.arange(PACKET_R)
    q, i = k >> 10, k & 1023
    pxk = ((q & (QX - 1)) << 5) + (i & 31)
    pyk = ((q >> _QX_SHIFT) << 5) + (i >> 5)
    pid = np.arange(p)
    px = (pid % tiles_x)[:, None] * TILE + pxk[None, :]
    py = (pid // tiles_x)[:, None] * TILE + pyk[None, :]
    return (py * width + px).reshape(-1)


def _traverse(tbl_ref, box_ref, signs_ref, o, idir, limit_fn, leaf_fn,
              stack_ref):
    """Shared stack-traversal loop (the TraversePrimaryN/TraverseShadow
    skeleton, bvh/traverse.cpp:14-149).

    ``limit_fn()`` -> (8,128) per-ray distance bound for box culls;
    ``leaf_fn(first, count, sp)`` -> new sp (may clear the stack)."""
    sign_base = pl.program_id(0) * 4

    def body(sp):
        node = stack_ref[sp - 1]
        sp = sp - 1
        child, count, axis, fnode = _meta(tbl_ref, node)

        def leaf_case(sp):
            return leaf_fn(child, count, sp)

        def inner_case(sp):
            sign = signs_ref[sign_base + axis]
            near = child + (fnode ^ sign)
            far = child + (1 - (fnode ^ sign))
            flo, fhi = _box(box_ref, far)
            nlo, nhi = _box(box_ref, near)
            lim = limit_fn()
            hit_far = _slab_any(o, idir, flo, fhi, lim)
            hit_near = _slab_any(o, idir, nlo, nhi, lim)
            stack_ref[sp] = far
            sp = sp + hit_far.astype(jnp.int32)
            stack_ref[sp] = near
            sp = sp + hit_near.astype(jnp.int32)
            return sp

        return jax.lax.cond(count > 0, leaf_case, inner_case, sp)

    rlo, rhi = _box(box_ref, 0)
    root_ok = _slab_any(o, idir, rlo, rhi, limit_fn())
    stack_ref[0] = 0
    sp0 = jax.lax.cond(root_ok, lambda: 1, lambda: 0)
    jax.lax.while_loop(lambda sp: sp > 0, body, sp0)


def _closest_leaf(o, d, tris_hbm, tscratch, sem,
                  best_ref, bu_ref, bv_ref, tri_ref):
    """Closest-hit leaf processing closure."""

    def leaf_fn(first, count, sp):
        cp = pltpu.make_async_copy(
            tris_hbm.at[pl.ds(first, LEAF_PAD), :], tscratch, sem
        )
        cp.start()
        cp.wait()
        for blk in range(LEAF_PAD // 4):
            r0 = blk * 4

            @pl.when(r0 < count)
            def _():
                det, u, v, tmul = _intersect4(o, d, _tri_cols(tscratch, r0))
                duv = det - u - v
                side = (jnp.maximum(u, jnp.maximum(v, duv)) <= 0.0) | (
                    jnp.minimum(u, jnp.minimum(v, duv)) >= 0.0
                )
                idet = 1.0 / jnp.where(det == 0.0, 1e-30, det)
                dist = tmul * idet
                row = jax.lax.broadcasted_iota(jnp.int32, (4, 1, 1), 0)
                ok = side & (det != 0.0) & (dist > 0.0) & ((r0 + row) < count)
                dist = jnp.where(ok, dist, BIG)
                m = jnp.min(dist, axis=0)  # (8, 128)
                upd = m < best_ref[:, :]
                is_min = (dist == m[None]) & ok
                ids = first + r0 + row
                tid = jnp.min(
                    jnp.where(is_min, ids, jnp.int32(2**30)), axis=0
                )
                sel_u = jnp.max(jnp.where(is_min, u * idet, -BIG), axis=0)
                sel_v = jnp.max(jnp.where(is_min, v * idet, -BIG), axis=0)
                best_ref[:, :] = jnp.where(upd, m, best_ref[:, :])
                tri_ref[:, :] = jnp.where(upd, tid, tri_ref[:, :])
                bu_ref[:, :] = jnp.where(upd, sel_u, bu_ref[:, :])
                bv_ref[:, :] = jnp.where(upd, sel_v, bv_ref[:, :])

        return sp

    return leaf_fn


# ---------------------------------------------------------------------------
# Camera-fused primary kernel (shared origin, raygen inside)
# ---------------------------------------------------------------------------


def _camera_kernel(tbl_ref, box_ref, cam_ref, signs_ref, tris_hbm,
                   dist_ref, u_ref, v_ref, tri_out, dx_ref, dy_ref, dz_ref,
                   best_ref, bu_ref, bv_ref, tri_ref, tscratch, stack_ref,
                   sem):
    """Primary rays: dirs generated from SMEM camera scalars
    (RayGenerator fused, ray_generator.cpp:23-50; shared origin
    RayGroup<1,0>, ray_group.h:74-110).

    cam layout (f32[16]): right(0:3), up(3:6), front*plane_dist(6:9),
    pos(9:12), half_w(12), half_h(13), inv_h(14), tiles_x(15)."""
    pid = pl.program_id(0)
    tiles_x = cam_ref[15].astype(jnp.int32)
    tx = pid % tiles_x
    ty = pid // tiles_x

    px, py = _pixel_xy(tx, ty)
    x = (px + 0.5 - cam_ref[12]) * cam_ref[14]
    y = (cam_ref[13] - py - 0.5) * cam_ref[14]

    dx = cam_ref[0] * x + cam_ref[3] * y + cam_ref[6]
    dy = cam_ref[1] * x + cam_ref[4] * y + cam_ref[7]
    dz = cam_ref[2] * x + cam_ref[5] * y + cam_ref[8]
    inv_len = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    dx = dx * inv_len
    dy = dy * inv_len
    dz = dz * inv_len

    o = (cam_ref[9], cam_ref[10], cam_ref[11])
    d = (dx, dy, dz)
    idir = tuple(1.0 / (c + 1e-8) for c in d)

    best_ref[:, :] = jnp.full((RAY_SUB, RAY_LANE), BIG, jnp.float32)
    bu_ref[:, :] = jnp.zeros((RAY_SUB, RAY_LANE), jnp.float32)
    bv_ref[:, :] = jnp.zeros((RAY_SUB, RAY_LANE), jnp.float32)
    tri_ref[:, :] = jnp.zeros((RAY_SUB, RAY_LANE), jnp.int32)

    leaf_fn = _closest_leaf(o, d, tris_hbm, tscratch, sem,
                            best_ref, bu_ref, bv_ref, tri_ref)
    _traverse(tbl_ref, box_ref, signs_ref, o, idir,
              lambda: best_ref[:, :], leaf_fn, stack_ref)

    dist_ref[0] = best_ref[:, :]
    u_ref[0] = bu_ref[:, :]
    v_ref[0] = bv_ref[:, :]
    tri_out[0] = tri_ref[:, :]
    dx_ref[0] = dx
    dy_ref[0] = dy
    dz_ref[0] = dz


# ---------------------------------------------------------------------------
# General closest-hit kernel (component-planar ray arrays)
# ---------------------------------------------------------------------------


def _closest_kernel(tbl_ref, box_ref, signs_ref,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
                    tris_hbm,
                    dist_ref, u_ref, v_ref, tri_out,
                    best_ref, bu_ref, bv_ref, tri_ref, tscratch, stack_ref,
                    sem):
    o = (ox_ref[0], oy_ref[0], oz_ref[0])
    d = (dx_ref[0], dy_ref[0], dz_ref[0])
    tmax = tm_ref[0]
    idir = tuple(1.0 / (c + 1e-8) for c in d)  # SafeInv (rtbase.h:117-120)

    active = tmax >= 0.0
    best_ref[:, :] = jnp.where(active, jnp.minimum(tmax, BIG), -BIG)
    bu_ref[:, :] = jnp.zeros_like(tmax)
    bv_ref[:, :] = jnp.zeros_like(tmax)
    tri_ref[:, :] = jnp.zeros(tmax.shape, jnp.int32)

    leaf_fn = _closest_leaf(o, d, tris_hbm, tscratch, sem,
                            best_ref, bu_ref, bv_ref, tri_ref)
    _traverse(tbl_ref, box_ref, signs_ref, o, idir,
              lambda: best_ref[:, :], leaf_fn, stack_ref)

    dist_ref[0] = best_ref[:, :]
    u_ref[0] = bu_ref[:, :]
    v_ref[0] = bv_ref[:, :]
    tri_out[0] = tri_ref[:, :]


# ---------------------------------------------------------------------------
# Shadow (any-hit) kernel — shared origin (the light), per-ray dir + tmax
# ---------------------------------------------------------------------------


def _shadow_body(tbl_ref, box_ref, signs_ref, o, d, tmax, tris_hbm,
                 out_ref, blocked_ref, tscratch, stack_ref, sem):
    idir = tuple(1.0 / (c + 1e-8) for c in d)

    active = tmax >= 0.0
    blocked_ref[:, :] = jnp.zeros(tmax.shape, jnp.float32)
    limit = jnp.where(active, tmax, -BIG)

    def open_limit():
        return jnp.where(blocked_ref[:, :] > 0.0, -BIG, limit)

    def leaf_fn(first, count, sp):
        cp = pltpu.make_async_copy(
            tris_hbm.at[pl.ds(first, LEAF_PAD), :], tscratch, sem
        )
        cp.start()
        cp.wait()
        for blk in range(LEAF_PAD // 4):
            r0 = blk * 4

            @pl.when(r0 < count)
            def _():
                det, u, v, tmul = _intersect4(o, d, _tri_cols(tscratch, r0))
                row = jax.lax.broadcasted_iota(jnp.int32, (4, 1, 1), 0)
                # single-sided shadow rule (triangle.cpp:95-96)
                occ = (
                    (jnp.minimum(u, v) >= 0.0)
                    & (u + v <= det)
                    & (tmul > 0.0)
                    & (tmul < tmax[None] * det)
                    & ((r0 + row) < count)
                )
                occ_any = jnp.max(jnp.where(occ, 1.0, 0.0), axis=0)
                blocked_ref[:, :] = jnp.maximum(blocked_ref[:, :], occ_any)

        # full-occlusion early exit (traverse.cpp:117-121)
        done = jnp.all((blocked_ref[:, :] > 0.0) | (limit < 0.0))
        return jax.lax.cond(done, lambda s: 0, lambda s: s, sp)

    _traverse(tbl_ref, box_ref, signs_ref, o, idir, open_limit, leaf_fn,
              stack_ref)
    out_ref[0] = blocked_ref[:, :]


def _shadow_kernel(tbl_ref, box_ref, orig_ref, signs_ref,
                   dx_ref, dy_ref, dz_ref, tm_ref, tris_hbm,
                   out_ref, blocked_ref, tscratch, stack_ref, sem):
    """Shadow rays FROM the shared light origin (scene_inl.h:127-129);
    orig_ref f32[4] = light position."""
    o = (orig_ref[0], orig_ref[1], orig_ref[2])
    d = (dx_ref[0], dy_ref[0], dz_ref[0])
    _shadow_body(tbl_ref, box_ref, signs_ref, o, d, tm_ref[0], tris_hbm,
                 out_ref, blocked_ref, tscratch, stack_ref, sem)


def _shadow_kernel_g(tbl_ref, box_ref, signs_ref,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
                     tris_hbm,
                     out_ref, blocked_ref, tscratch, stack_ref, sem):
    """Any-hit with per-ray origins (general wavefront occlusion)."""
    o = (ox_ref[0], oy_ref[0], oz_ref[0])
    d = (dx_ref[0], dy_ref[0], dz_ref[0])
    _shadow_body(tbl_ref, box_ref, signs_ref, o, d, tm_ref[0], tris_hbm,
                 out_ref, blocked_ref, tscratch, stack_ref, sem)


# ---------------------------------------------------------------------------
# Decoupled interval traversal (scalar-core BVH walk + leaf DMA ring)
#
# The reference culls per node with a whole-packet interval test BEFORE any
# per-ray work (RayInterval, ray_group.h:293-338; BBox::TestInterval,
# bounding_box.cpp:208-236). On TPU that observation is worth far more than
# on SSE: a per-node vectorized slab test needs a vector->scalar reduction
# (jnp.any) to drive the stack, and that sync is the single most expensive
# thing in the loop. Here the ENTIRE node walk runs on the scalar core with
# interval arithmetic only (~30 scalar ops per node, zero syncs); leaves
# are pushed onto an NBUF-deep DMA ring (the SPU Cache<T> prefetch idea,
# spu/base.h:85-135) so HBM latency overlaps both the scalar walk and the
# VPU intersection of earlier leaves. Measured on feline 1024^2 the
# interval walk visits only ~7% more nodes / ~18% more triangles than the
# exact per-ray walk (64x64-pixel packets are that coherent).
#
# The one scalar<->vector sync left is per LEAF DRAIN: a max-reduce of the
# remaining useful distance (closest hit: max over rays of best; shadow:
# max over unblocked rays of tmax). It doubles as the reference's
# full-occlusion early exit (traverse.cpp:117-121): bound < 0 => stop.
# ---------------------------------------------------------------------------


def _ival_bounds(idir):
    """Per-packet scalar inverse-direction interval from (8,128) idirs.

    Returns ((imin, imax, span) per axis, sign per axis). ``span`` marks a
    direction component crossing zero - that axis can never cull. The
    per-axis near/far ordering sign comes from the interval midpoint
    (reference uses ray 0, traverse.cpp:21)."""
    out = []
    signs = []
    for c in idir:
        im = jnp.min(c)
        iM = jnp.max(c)
        out.append((im, iM, (im < 0.0) & (iM > 0.0)))
        signs.append((im + iM < 0.0).astype(jnp.int32))
    return tuple(out), tuple(signs)


def _ival_test_vals(box6, o, bnds, maxb):
    """Whole-packet conservative slab test from 6 scalar bounds, pure
    scalar core. The rebuild of BBox::TestInterval
    (bounding_box.cpp:208-236): min/max of (plane - origin) * idir over
    the idir interval per axis."""
    tn = jnp.float32(0.0)
    tf = maxb
    for k in range(3):
        im, iM, span = bnds[k]
        a = box6[k] - o[k]
        c = box6[3 + k] - o[k]
        p1 = a * im
        p2 = a * iM
        p3 = c * im
        p4 = c * iM
        tnk = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
        tfk = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
        tn = jnp.maximum(tn, jnp.where(span, -BIG, tnk))
        tf = jnp.minimum(tf, jnp.where(span, BIG, tfk))
    return (tn <= tf) & (tf > 0.0)


def _box6(box_ref, node):
    b = node * 6
    return tuple(box_ref[b + k] for k in range(6))


def _ival_bounds_g(o, idir):
    """Per-packet interval bounds for PER-RAY-ORIGIN packets (the full
    RayInterval of the reference, ray_group.h:293-338: min/max of origin
    AND inverse direction). Returns per-axis (imin, imax, omin, omax) and
    near-child signs. No span flag: the 8-corner product test below is
    exact over the (origin x idir) rectangle even when a direction
    component crosses zero (products over a rectangle extremize at
    corners)."""
    out = []
    signs = []
    for k in range(3):
        im = jnp.min(idir[k])
        iM = jnp.max(idir[k])
        out.append((im, iM, jnp.min(o[k]), jnp.max(o[k])))
        signs.append((im + iM < 0.0).astype(jnp.int32))
    return tuple(out), tuple(signs)


def _ival_test_vals_g(box6, bnds, maxb):
    """Conservative whole-packet slab test with origin intervals: per
    axis, min/max of (plane - o) * i over o in [omin, omax] x i in
    [imin, imax] — 8 corner products per axis (BBox::TestInterval with
    a full RayInterval, bounding_box.cpp:208-236)."""
    tn = jnp.float32(0.0)
    tf = maxb
    for k in range(3):
        im, iM, om, oM = bnds[k]
        a1 = box6[k] - om
        a2 = box6[k] - oM
        c1 = box6[3 + k] - om
        c2 = box6[3 + k] - oM
        lo_min = jnp.minimum(jnp.minimum(a1 * im, a1 * iM),
                             jnp.minimum(a2 * im, a2 * iM))
        lo_max = jnp.maximum(jnp.maximum(a1 * im, a1 * iM),
                             jnp.maximum(a2 * im, a2 * iM))
        hi_min = jnp.minimum(jnp.minimum(c1 * im, c1 * iM),
                             jnp.minimum(c2 * im, c2 * iM))
        hi_max = jnp.maximum(jnp.maximum(c1 * im, c1 * iM),
                             jnp.maximum(c2 * im, c2 * iM))
        tn = jnp.maximum(tn, jnp.minimum(lo_min, hi_min))
        tf = jnp.minimum(tf, jnp.maximum(lo_max, hi_max))
    return (tn <= tf) & (tf > 0.0)


# --- node-mask pre-pass (XLA-side; see compute_masks above) ----------------

_NMASK = os.environ.get("SNAIL_NMASK", "1") != "0"


def _mask_L(nv: int) -> int:
    """Lane dim of the per-packet mask rows: nv*32 words as (8, L)."""
    return max(128, _next_pow2(-(-nv * 32 // 8)))


def compute_masks(mk_boxv, im, iM, om, oM, maxb0):
    """Dense per-(packet, node) conservative interval test on the VPU —
    the node-mask pre-pass moved OUT of the kernels into one XLA pass
    per wavefront. mk_boxv f32[6, NV, 8, 128] (build_mask_boxv; includes
    page-local nodes for paged scenes), per-packet interval bounds
    im/iM/om/oM f32[P, 3] and bound maxb0 f32[P].

    Returns i32[P, 8, L] word rows, one DMA-able row set per packet:
    node (mask index) i -> flat word (i>>10)*32 + ((i>>2)&31), bit
    ((i&3)<<3) | ((i>>7)&7). 32 node bits per word.

    The scalar walk previously ran this test twice per node pop (~45
    scalar ops each, SMEM-latency-bound); the paged walk ran it for
    every page-local node with no mask at all (457 ms/frame on the
    1 Mtri terrain). Here it is dense contiguous VPU math at full
    throughput."""
    nv = mk_boxv.shape[1]
    l = _mask_L(nv)

    def one(args):
        imp, iMp, omp, oMp, mb = args
        tn = jnp.zeros((nv, 8, 128), jnp.float32)
        tf = jnp.full((nv, 8, 128), mb, jnp.float32)
        for k in range(3):
            a1 = mk_boxv[k] - omp[k]
            a2 = mk_boxv[k] - oMp[k]
            c1 = mk_boxv[3 + k] - omp[k]
            c2 = mk_boxv[3 + k] - oMp[k]
            lo_min = jnp.minimum(jnp.minimum(a1 * imp[k], a1 * iMp[k]),
                                 jnp.minimum(a2 * imp[k], a2 * iMp[k]))
            lo_max = jnp.maximum(jnp.maximum(a1 * imp[k], a1 * iMp[k]),
                                 jnp.maximum(a2 * imp[k], a2 * iMp[k]))
            hi_min = jnp.minimum(jnp.minimum(c1 * imp[k], c1 * iMp[k]),
                                 jnp.minimum(c2 * imp[k], c2 * iMp[k]))
            hi_max = jnp.maximum(jnp.maximum(c1 * imp[k], c1 * iMp[k]),
                                 jnp.maximum(c2 * imp[k], c2 * iMp[k]))
            tn = jnp.maximum(tn, jnp.minimum(lo_min, hi_min))
            tf = jnp.minimum(tf, jnp.maximum(lo_max, hi_max))
        ok = ((tn <= tf) & (tf > 0.0)).astype(jnp.int32)
        w1 = ok[:, 0, :]
        for sb in range(1, 8):
            w1 = w1 | jnp.left_shift(ok[:, sb, :], sb)
        w1 = w1.reshape(nv, 32, 4)
        w2 = (w1[:, :, 0] | jnp.left_shift(w1[:, :, 1], 8)
              | jnp.left_shift(w1[:, :, 2], 16)
              | jnp.left_shift(w1[:, :, 3], 24))
        return w2.reshape(-1)

    words = jax.lax.map(one, (im, iM, om, oM, maxb0), batch_size=32)
    words = jnp.pad(words, ((0, 0), (0, 8 * l - words.shape[1])))
    return words.reshape(im.shape[0], 8, l)


def _interval_of(v, axis):
    """Conservatively widened per-packet min/max (guards the f32
    reassociation delta between the XLA bound computation and the
    kernel's own per-ray math)."""
    lo = jnp.min(v, axis=axis)
    hi = jnp.max(v, axis=axis)
    w = 1e-5
    return (lo - jnp.abs(lo) * w - 1e-12, hi + jnp.abs(hi) * w + 1e-12)


def _dir_bounds(dx, dy, dz):
    """(P, ...) planar dir components -> per-packet idir bounds (P, 3).

    Reduces over every non-packet axis IN the arrays' native layout —
    reshaping (P, 32, 128) packets to (P, 4096) first forces a lane
    relayout copy that measured ~5 ms/Mray."""
    ax = tuple(range(1, dx.ndim))
    ims, iMs = [], []
    for c in (dx, dy, dz):
        ic = 1.0 / (c + 1e-8)
        lo, hi = _interval_of(ic, ax)
        ims.append(lo)
        iMs.append(hi)
    return jnp.stack(ims, -1), jnp.stack(iMs, -1)


def _camera_packet_bounds(camera, width: int, height: int,
                          root_lo, root_hi):
    """Per-packet interval bounds for primary rays: replicate the
    in-kernel raygen + t_exit bound in XLA (same formulas; intervals
    widened). Returns (im, iM, om, maxb0) with om == oM (shared origin);
    shared by the node-mask and leaf-worklist passes."""
    tiles_x = width // TILE
    p = tiles_x * (height // TILE)
    pid = jnp.arange(p, dtype=jnp.int32)
    # any within-packet order works for bounds; raster in the packets'
    # native (P, 32, 128) tiling (a (P, 4096) layout pays a relayout)
    k = (jnp.arange(TILE * TILE, dtype=jnp.int32)
         .reshape(1, RAY_SUB, RAY_LANE))
    px = ((pid % tiles_x)[:, None, None] * TILE + (k % TILE)).astype(
        jnp.float32)
    py = ((pid // tiles_x)[:, None, None] * TILE + (k // TILE)).astype(
        jnp.float32)
    x = (px + 0.5 - width * 0.5) * jnp.float32(1.0 / height)
    y = (height * 0.5 - py - 0.5) * jnp.float32(1.0 / height)
    f = camera.front * camera.plane_dist
    dx = camera.right[0] * x + camera.up[0] * y + f[0]
    dy = camera.right[1] * x + camera.up[1] * y + f[1]
    dz = camera.right[2] * x + camera.up[2] * y + f[2]
    inv_len = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    dx, dy, dz = dx * inv_len, dy * inv_len, dz * inv_len
    im, iM = _dir_bounds(dx, dy, dz)
    o = camera.pos.astype(jnp.float32)
    om = jnp.broadcast_to(o, (p, 3))
    # t_exit cap per packet (mirrors the in-kernel root-exit bound)
    tns, tfs = [], []
    for ci, c in enumerate((dx, dy, dz)):
        ic = 1.0 / (c + 1e-8)
        t1 = (root_lo[ci] - o[ci]) * ic
        t2 = (root_hi[ci] - o[ci]) * ic
        tns.append(jnp.minimum(t1, t2))
        tfs.append(jnp.maximum(t1, t2))
    tn = jnp.maximum(jnp.maximum(tns[0], tns[1]), tns[2])
    tf = jnp.minimum(jnp.minimum(tfs[0], tfs[1]), tfs[2])
    t_exit = jnp.where((tn <= tf) & (tf > 0.0), tf * 1.0001, 0.0)
    maxb0 = jnp.max(t_exit, axis=(1, 2)) * 1.0002 + 1e-6
    return im, iM, om, maxb0


@partial(jax.jit, static_argnames=("width", "height"))
def _camera_mask_words(mk_boxv, camera, width: int, height: int,
                       root_lo, root_hi):
    """Per-packet node masks for the camera kernel."""
    im, iM, om, maxb0 = _camera_packet_bounds(camera, width, height,
                                              root_lo, root_hi)
    return compute_masks(mk_boxv, im, iM, om, om, maxb0)


def _shared_packet_bounds(origin, dx, dy, dz, tm):
    """Per-packet bounds for shared-origin any-hit wavefronts: packed
    (P, RAY_SUB, RAY_LANE) dirs + tmax; origin f32[>=3]. Returns
    (im, iM, om, maxb0), om == oM."""
    p = dx.shape[0]
    ax = tuple(range(1, dx.ndim))
    im, iM = _dir_bounds(dx, dy, dz)
    om = jnp.broadcast_to(origin[:3].astype(jnp.float32), (p, 3))
    limit = jnp.where(tm >= 0.0, tm, -BIG)
    maxb0 = jnp.max(limit, axis=ax) * 1.0002 + 1e-6
    return im, iM, om, maxb0


@jax.jit
def _shared_mask_words(mk_boxv, origin, dx, dy, dz, tm):
    """Per-packet node masks for the shared-origin any-hit kernel."""
    im, iM, om, maxb0 = _shared_packet_bounds(origin, dx, dy, dz, tm)
    return compute_masks(mk_boxv, im, iM, om, om, maxb0)


def _general_packet_bounds(ox, oy, oz, dx, dy, dz, tm):
    """Per-packet bounds for the general kernels: per-ray origins AND
    directions (the full RayInterval, ray_group.h:293-338). Returns
    (im, iM, om, oM, maxb0)."""
    ax = tuple(range(1, dx.ndim))
    im, iM = _dir_bounds(dx, dy, dz)
    oms, oMs = [], []
    for c in (ox, oy, oz):
        lo, hi = _interval_of(c, ax)
        oms.append(lo)
        oMs.append(hi)
    om = jnp.stack(oms, -1)
    oM = jnp.stack(oMs, -1)
    best0 = jnp.where(tm >= 0.0, jnp.minimum(tm, BIG), -BIG)
    maxb0 = jnp.max(best0, axis=ax) * 1.0002 + 1e-6
    return im, iM, om, oM, maxb0


@jax.jit
def _general_mask_words(mk_boxv, ox, oy, oz, dx, dy, dz, tm):
    """Per-packet node masks for the general kernels."""
    im, iM, om, oM, maxb0 = _general_packet_bounds(ox, oy, oz, dx, dy,
                                                   dz, tm)
    return compute_masks(mk_boxv, im, iM, om, oM, maxb0)


def _nm_bit(nm_ref, n):
    """Scalar read of node n's pre-test bit from the per-packet mask
    rows ((8, L) SMEM, compute_masks packing: 32 node bits/word)."""
    l = nm_ref.shape[1]
    sh = l.bit_length() - 1
    f = (jax.lax.shift_right_logical(n, 10) * 32
         + (jax.lax.shift_right_logical(n, 2) & 31))
    w = nm_ref[jax.lax.shift_right_logical(f, sh), f & (l - 1)]
    bit = jnp.left_shift(n & 3, 3) | (jax.lax.shift_right_logical(n, 7) & 7)
    return (jax.lax.shift_right_logical(w, bit) & 1) > 0


def _ival_test(box_ref, node, o, bnds, maxb):
    return _ival_test_vals(_box6(box_ref, node), o, bnds, maxb)


def _leaf_dma(tris_hbm, tscratch, sems, slot, first):
    return pltpu.make_async_copy(
        tris_hbm.at[pl.ds(first, IVAL_LEAF), :],
        tscratch.at[slot],
        sems.at[slot],
    )


def _boxrow_dma(boxrows_hbm, lbrow_ref, bsems, slot, t):
    """One 512-B leaf-box row (16 boxes) HBM -> the slot's SMEM row."""
    return pltpu.make_async_copy(
        boxrows_hbm.at[pl.ds(jax.lax.shift_right_logical(t, 4), 1), :],
        lbrow_ref.at[pl.ds(slot, 1), :],
        bsems.at[slot],
    )


def _stage_tables(tbl_hbm, box_hbm, tbl_s, box_s, ssem):
    """Fill the persistent node-table scratches ONCE, at grid step 0.

    SMEM-space pallas INPUTS are re-staged from HBM on every grid step,
    and SMEM fill is slow (~37 us/packet for feline's 291 KB tables —
    measured round 4: a walk-free kernel still cost 11 of 19 ms). Grid
    steps run sequentially on the core and scratch persists across them,
    so one explicit DMA at step 0 replaces 256 implicit ones."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        c1 = pltpu.make_async_copy(tbl_hbm, tbl_s, ssem.at[0])
        c2 = pltpu.make_async_copy(box_hbm, box_s, ssem.at[1])
        c1.start()
        c2.start()
        c1.wait()
        c2.wait()


def _load_mask(masks_hbm, mask_s, ssem):
    """DMA this packet's node-mask rows (compute_masks output) into
    SMEM. A few KB per packet; replaces the in-kernel dense prologue."""
    cp = pltpu.make_async_copy(masks_hbm.at[pl.program_id(0)], mask_s,
                               ssem.at[2])
    cp.start()
    cp.wait()


def _or_across_rays(acc):
    """Bitwise-OR an (8, 128) i32 across all rays: log-step lane then
    sublane rotations; every element ends up holding the union, so one
    jnp.max read returns it."""
    s = RAY_LANE // 2
    while s:
        acc = acc | pltpu.roll(acc, s, 1)
        s //= 2
    s = RAY_SUB // 2
    while s:
        acc = acc | pltpu.roll(acc, s, 0)
        s //= 2
    return acc


def _make_chunk_drain(o, idir, lim_fn, process_fn, tris_hbm, tscratch,
                      sems, lq_ref, bits_ref, qlist_ref, stats_ref,
                      box_ref=None, lbox_ref=None, browt=None,
                      lbt_ref=None, bound_bits=False):
    """Build the shared Phase-B drain: one vector->scalar sync per chunk —
    batched per-leaf per-quarter culls + the stale packet bound, then
    drain surviving (leaf, quarter) pairs. Bit (i*NQ + q) of the packed
    words = "leaf slot i has a passing ray in vreg row block q"; the
    variable-shift encode keeps the whole pack one OR-reduction.

    Leaf bboxes come from ``box_ref`` (the staged node table, read by the
    node id in lq_ref — flat scenes, where the table cannot page out) or
    from ``lbox_ref`` (enqueue-time copies — the paged walk), or from
    ``browt = (boxrows_hbm, lbrow_ref, bsems)`` — enqueue-time box-ROW
    DMAs for big-scene worklists whose boxes cannot live in SMEM: row
    t>>4 of the (ceil(Lp/16), 128) HBM table holds 16 leaf boxes and
    lands in the slot's 128-lane SMEM row; the leaf index t rides
    lq_ref[i*3+2] so the cull reads lanes (t&15)*8 + k. Used by both
    the stack walk (_traverse_ival) and the drain-only worklist kernels
    (_traverse_wl)."""

    def chunk_drain(nq, maxb):
        if browt is not None and _PROF != "nodma":
            # the slab culls below READ the DMA'd box rows — wait the
            # box copies FIRST (the enqueue-time-scalar-copy modes have
            # no such hazard; reading an in-flight row produced sparse
            # missed-hit corruption on hardware)
            boxrows_hbm, lbrow_ref, bsems = browt
            for i in range(NBUF):

                @pl.when(i < nq)
                def _(i=i):
                    _boxrow_dma(boxrows_hbm, lbrow_ref, bsems, i,
                                lq_ref[i * 3 + 2]).wait()

        lim = lim_fn()
        if _PROF in ("noslab", "nosync", "nodma"):  # ablation: no culls
            for w in range(_BITS_WORDS):
                bits_ref[w] = 0
        else:
            if _DRAIN == "leaf":  # one bit per leaf (whole-packet drain)
                qsh = jnp.int32(0)
            else:  # one bit per (leaf, quarter)
                qsh = jax.lax.broadcasted_iota(
                    jnp.int32, (RAY_SUB, RAY_LANE), 0
                ) // QR  # quarter id per row
            accs = [jnp.zeros((RAY_SUB, RAY_LANE), jnp.int32)
                    for _ in range(_BITS_WORDS)]
            for i in range(NBUF):
                if box_ref is not None:
                    # read the leaf bbox straight from the node table
                    # (no enqueue-time copy)
                    b = lq_ref[i * 3 + 2] * 6
                    lo = (box_ref[b], box_ref[b + 1], box_ref[b + 2])
                    hi = (box_ref[b + 3], box_ref[b + 4], box_ref[b + 5])
                elif lbt_ref is not None:
                    # whole leaf-box-row table staged in SMEM (fits for
                    # small scenes): no per-enqueue DMA, no waits
                    t = lq_ref[i * 3 + 2]
                    r0 = jax.lax.shift_right_logical(t, 4)
                    off = (t & 15) * 8
                    lo = (lbt_ref[r0, off], lbt_ref[r0, off + 1],
                          lbt_ref[r0, off + 2])
                    hi = (lbt_ref[r0, off + 3], lbt_ref[r0, off + 4],
                          lbt_ref[r0, off + 5])
                elif browt is not None:
                    _, lbrow_ref, bsems = browt
                    off = (lq_ref[i * 3 + 2] & 15) * 8
                    lo = (lbrow_ref[i, off], lbrow_ref[i, off + 1],
                          lbrow_ref[i, off + 2])
                    hi = (lbrow_ref[i, off + 3], lbrow_ref[i, off + 4],
                          lbrow_ref[i, off + 5])
                else:
                    # leaf bbox captured at enqueue (lbox_ref) — node
                    # tables may have paged over since
                    lo = (lbox_ref[i * 6], lbox_ref[i * 6 + 1],
                          lbox_ref[i * 6 + 2])
                    hi = (lbox_ref[i * 6 + 3], lbox_ref[i * 6 + 4],
                          lbox_ref[i * 6 + 5])
                m = _slab_mask(o, idir, lo, hi, lim)
                valid = (i < nq).astype(jnp.int32)
                w = (i * NQ) // 32
                sh = qsh + ((i * NQ) % 32)
                accs[w] = accs[w] | jnp.where(
                    m, jnp.left_shift(valid, sh), 0)
            for w in range(_BITS_WORDS):
                bits_ref[w] = jnp.max(_or_across_rays(accs[w]))
        if _PROF in ("nosync", "nodma"):  # ablation: no vector->scalar read
            newb = maxb
        elif bound_bits:
            # the worklist scan compares the bound against band floors
            # stored as raw f32 bits (Mosaic has no scalar bitcast):
            # for non-negative IEEE floats the bit pattern is monotone,
            # so the bound travels as an i32 of its own bits
            newb = jnp.max(pltpu.bitcast(jnp.maximum(lim, 0.0),
                                         jnp.int32))
        else:
            newb = jnp.max(lim)
        if stats_ref is not None:
            stats_ref[0, 0, 4] = stats_ref[0, 0, 4] + 1
        for i in range(NBUF):  # static slots: no dynamic VMEM addressing

            @pl.when(i < nq)
            def _(i=i):  # every started DMA must be waited (slot reuse)
                if _PROF != "nodma":
                    _leaf_dma(tris_hbm, tscratch, sems, i,
                              lq_ref[i * 3]).wait()

        if _DRAIN == "leaf" and not _PROF:
            # round-1 structure: static per-leaf pl.when, whole packet
            for i in range(NBUF):
                bitk = jax.lax.shift_right_logical(
                    bits_ref[(i * NQ) // 32], (i * NQ) % 32) & 1

                @pl.when(bitk > 0)
                def _(i=i):
                    process_fn(i, lq_ref[i * 3], lq_ref[i * 3 + 1], None)
                    if stats_ref is not None:
                        stats_ref[0, 0, 2] = stats_ref[0, 0, 2] + NQ
                        stats_ref[0, 0, 3] = (
                            stats_ref[0, 0, 3] + lq_ref[i * 3 + 1]
                        )
            return newb

        # scalar-compact the surviving (leaf, quarter) pairs into ONE
        # LIST PER QUARTER, then drain each quarter's list in its own
        # dynamically-bounded loop with a STATIC quarter index — every
        # ray-block slice inside process_fn (d_refs[q*QR:...],
        # best_ref[q*QR:...]) then has a static sublane offset, which
        # Mosaic turns into plain vector loads (a dynamic q measured
        # ~750 extra cycles per drain in the round-4 QR scan).
        # Alternatives measured earlier: fori over all NBUF*NQ pairs
        # with pl.when inside (+4.2 ms), static NBUF x NQ unroll
        # (+2.4 ms). Compaction costs ~200 scalar cycles/chunk and the
        # drain bodies run exactly survivor-count times.
        # branchless compaction: ALWAYS store slot i at the list head —
        # the head only advances when the bit is set, so dead stores are
        # overwritten (48 predicated regions per chunk measured as real
        # walk-bucket time; unconditional store + add is ~4 ops each).
        n_liv_q = []
        for q in range(NQ):
            n_liv = jnp.int32(0)
            for i in range(NBUF):  # static scalar loop
                k = i * NQ + q
                bitk = jax.lax.shift_right_logical(
                    bits_ref[k // 32], k % 32) & 1
                qlist_ref[q * NBUF + n_liv] = i
                n_liv = n_liv + bitk
            n_liv_q.append(n_liv)

        if _PROF:  # ablations: no compaction, no drain
            return newb

        for q in range(NQ):  # static quarter -> static ray-block slices

            def drain_body(j, carry, q=q):
                slot = qlist_ref[q * NBUF + j]
                process_fn(slot, lq_ref[slot * 3], lq_ref[slot * 3 + 1], q)
                if stats_ref is not None:
                    stats_ref[0, 0, 2] = stats_ref[0, 0, 2] + 1
                    stats_ref[0, 0, 3] = (
                        stats_ref[0, 0, 3] + lq_ref[slot * 3 + 1]
                    )
                return carry

            jax.lax.fori_loop(0, n_liv_q[q], drain_body, 0)

        return newb

    return chunk_drain


PAGE_BASE = 1 << 26  # stack ids >= PAGE_BASE are page-local (paged walk)
PG_SLOTS = int(os.environ.get("SNAIL_PG_SLOTS", 4))  # direct-mapped page
# cache slots (the SPU Cache<T, size, tag> analogue, spu/base.h:85-135):
# a page fault skips the DMA when its tag already matches, so A,B,A page
# alternations stop re-streaming 80 KB per visit. Power of two.


def _traverse_ival(tbl_ref, box_ref, o, idir, itest, signs, maxb0,
                   lim_fn, process_fn,
                   tris_hbm, tscratch, sems, stack_ref, lq_ref, bits_ref,
                   qlist_ref, lbox_ref, stats_ref=None, pages=None,
                   nm_ref=None):
    """Chunked two-phase interval walk.

    Phase A (pure scalar): pop nodes, interval-test children, queue up to
    NBUF leaves - starting each leaf's HBM->VMEM DMA the moment it is
    found, so the copies overlap the rest of the walk. Phase B: ONE
    vector->scalar sync point per chunk computes (a) per-leaf per-QUARTER
    per-ray slab culls for all queued leaves, OR-packed across rays into
    one bit per (leaf, quarter) — quarter = one (8, 128) vreg row block —
    the per-ray refinement the scalar interval walk cannot do — and (b)
    the refreshed packet distance bound ``max(lim_fn())`` (doubling as
    the shadow full-occlusion exit, traverse.cpp:117-121). Both reads
    happen BEFORE the chunk's intersections are enqueued, so the bound is
    one chunk stale (conservative, still correct) and the scalar walk of
    chunk k+1 overlaps the VPU intersections of chunk k — the decoupled-
    access/execute pipelining that replaces the reference's
    [firstActive, lastActive] narrowing. ``process_fn(slot, first,
    count, q)`` then intersects ONLY the quarters whose bit survived —
    the TPU shape of the reference's per-ray active-range narrowing
    (bounding_box.cpp:62-142): lockstep lanes can't narrow ray by ray,
    but they can skip whole vreg blocks.

    Keeping Phase B out of ``lax.cond``-with-carry matters: vector code
    under a carried cond inside the walk loop measured ~8x slower than
    this structure (Mosaic can't branch it cleanly).

    ``stats_ref`` (optional SMEM i32 out, len >= 5) receives real traversal
    counters — the rebuild of TreeStats' in-kernel counting
    (reference src/tree_stats.h:36-130): [0] nodes popped, [1] leaves
    enqueued, [2] leaf-QUARTERS processed after the per-ray cull,
    [3] triangle-quarter intersections (tris x surviving quarters),
    [4] sync chunks. Increments are compiled in only when the ref is
    present, so the hot path pays nothing.

    ``pages`` (optional) enables the two-level large-scene walk
    (bvh/pages.py layout; the SPU node-cache analogue, spu/base.h:85-135):
    a 6-tuple (pg_meta_hbm, pg_box_hbm, pmeta_ref, pbox_ref,
    ptag_ref, psem).
    Top-tree *page pointer* nodes (axis == 3) DMA their page's meta+box
    rows into the SMEM page slot and push the page-local root
    (PAGE_BASE + 0); LIFO order guarantees the whole page subtree drains
    before any older stack entry, so one slot suffices. Enqueued leaves
    carry their bbox in ``lbox_ref`` (copied at enqueue), so Phase B
    culls never re-read a node table that may since have been paged out.
    """
    sx, sy, sz = signs
    if pages is not None:
        (pg_meta_hbm, pg_box_hbm, pmeta_ref, pbox_ref, ptag_ref, psem,
         mk_off, mk_cap) = pages

        # the page cache PERSISTS across grid steps (scratch is carried
        # between sequential packets on the core) — adjacent packets
        # touch overlapping pages, so only the FIRST packet starts cold
        # (round-3 reset every packet and re-streamed ~64 KB per fault)
        @pl.when(pl.program_id(0) == 0)
        def _():
            for i in range(PG_SLOTS):
                ptag_ref[i] = -1
            ptag_ref[PG_SLOTS] = 0
            ptag_ref[PG_SLOTS + 1] = mk_off
    if stats_ref is not None:
        for i in range(8):
            stats_ref[0, 0, i] = 0

    use2 = pages is None and _WALK2 and tbl_ref.shape[0] > 2
    if use2:
        # The chunk culls read box_ref[lq[i*3+2] * 6] for ALL NBUF slots
        # (static unroll; invalid slots are masked out of the bits).
        # Slots never yet enqueued hold uninitialized SMEM on the very
        # first chunk of grid step 0 — a garbage node id there is an
        # out-of-bounds scalar read (intermittent hardware aborts,
        # round-4 field debugging). Zero the ids once; scratch persists
        # across the remaining grid steps and stale ids from earlier
        # chunks/packets are always in-bounds.

        @pl.when(pl.program_id(0) == 0)
        def _():
            for i in range(NBUF):
                lq_ref[i * 3 + 2] = 0

    def _enq(nq, first, count, this):
        """Queue one leaf (flat walk v2): start its DMA and record
        (first, count, node id). The leaf bbox is NOT copied — the chunk
        culls read box_ref[id] directly (the table can't page out on the
        flat path), which drops 12 SMEM ops from the enqueue hot path
        (~180 cycles/enqueue measured, SMEM-latency-bound)."""
        if _PROF != "nodma":
            _leaf_dma(tris_hbm, tscratch, sems, nq, first).start()
        lq_ref[nq * 3] = first
        lq_ref[nq * 3 + 1] = count
        lq_ref[nq * 3 + 2] = this
        if stats_ref is not None:
            stats_ref[0, 0, 1] = stats_ref[0, 0, 1] + 1

    def walk_body2(carry):
        """Flat-scene walk, leaf-aware parent expansion with the
        CURRENT NODE IN A REGISTER: every processed node is a passing
        inner node (leaf children go straight to the DMA queue from
        their parent, their leaf-ness/counts packed in the parent's w1
        bits), and the near child continues in the register instead of
        a stack store->load round trip — the walk is SMEM-latency-bound
        (~165 cycles/iteration measured), so shortening the serial
        pop->meta->test chain is what matters. The speculative pop load
        for the both-children-fail case runs off the critical path."""
        top, sp, nq, maxb = carry
        node = top
        w0 = tbl_ref[node * 2]
        w1 = tbl_ref[node * 2 + 1]
        # speculative pop (used only when no inner child survives);
        # issued early so its latency hides under the meta chain
        prev = stack_ref[jnp.maximum(sp - 1, 0)]
        child = jax.lax.shift_right_logical(w0, 9)
        axis = w0 & 0x3
        fnode = w1 & 1
        if stats_ref is not None:
            stats_ref[0, 0, 0] = stats_ref[0, 0, 0] + 1
        sgn = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))
        bit = fnode ^ sgn
        near = child + bit
        far = child + 1 - bit
        l_leaf = jax.lax.shift_right_logical(w1, 1) & 1
        r_leaf = jax.lax.shift_right_logical(w1, 2) & 1
        l_cnt = jax.lax.shift_right_logical(w1, 3) & 0x7F
        r_cnt = jax.lax.shift_right_logical(w1, 10) & 0x7F
        near_leaf = jnp.where(bit == 0, l_leaf, r_leaf)
        far_leaf = jnp.where(bit == 0, r_leaf, l_leaf)
        near_cnt = jnp.where(bit == 0, l_cnt, r_cnt)
        far_cnt = jnp.where(bit == 0, r_cnt, l_cnt)
        if nm_ref is None:
            pf = itest(_box6(box_ref, far), maxb).astype(jnp.int32)
            pn = itest(_box6(box_ref, near), maxb).astype(jnp.int32)
        else:
            pf = _nm_bit(nm_ref, far).astype(jnp.int32)
            pn = _nm_bit(nm_ref, near).astype(jnp.int32)
        inner_n = pn * (1 - near_leaf)
        inner_f = pf * (1 - far_leaf)
        # far goes to memory only when near also continues in-register
        stack_ref[sp] = far
        sp = sp + inner_f * inner_n
        popped = (1 - inner_n) * (1 - inner_f)
        top = jnp.where(
            inner_n > 0, near,
            jnp.where(inner_f > 0, far,
                      jnp.where(sp > 0, prev, -1)),
        )
        sp = sp - popped * (sp > 0).astype(jnp.int32)
        # enqueue passing LEAF children, near first (bound quality)
        en = pn * near_leaf

        @pl.when(en > 0)
        def _():
            _enq(nq, jax.lax.shift_right_logical(tbl_ref[near * 2], 9),
                 near_cnt, near)

        nq = nq + en
        ef = pf * far_leaf

        @pl.when(ef > 0)
        def _():
            _enq(nq, jax.lax.shift_right_logical(tbl_ref[far * 2], 9),
                 far_cnt, far)

        nq = nq + ef
        return top, sp, nq, maxb

    def walk_body(carry):
        sp, nq, maxb = carry
        node = stack_ref[sp - 1]
        sp = sp - 1
        if pages is None:
            w0 = tbl_ref[node * 2]
            w1 = tbl_ref[node * 2 + 1]
            in_pg = None
        else:
            in_pg = node >= PAGE_BASE

            cur8 = ptag_ref[PG_SLOTS] * 8

            def _rd_pg():
                li = node - PAGE_BASE
                return (_pg_rd(pmeta_ref, cur8, li * 2),
                        _pg_rd(pmeta_ref, cur8, li * 2 + 1))

            def _rd_top():
                return tbl_ref[node * 2], tbl_ref[node * 2 + 1]

            w0, w1 = jax.lax.cond(in_pg, _rd_pg, _rd_top)
        child = jax.lax.shift_right_logical(w0, 9)
        count = jax.lax.shift_right_logical(w0, 2) & 0x7F
        axis = w0 & 0x3
        fnode = w1 & 1
        if stats_ref is not None:
            stats_ref[0, 0, 0] = stats_ref[0, 0, 0] + 1

        def _node_box6(local):
            """6 scalar bounds of a node in the CURRENT space."""
            if pages is None:
                return _box6(box_ref, local)
            return jax.lax.cond(
                in_pg,
                lambda: _pg_box6(pbox_ref, cur8, local),
                lambda: _box6(box_ref, local),
            )

        def leaf_case(args):
            sp, nq = args
            if pages is None:
                first = child
                this = node
            else:
                # page leaves keep the global first-tri row in w1 (32
                # bits; the packed child field is only 22)
                first = jnp.where(in_pg, w1, child)
                this = jnp.where(in_pg, node - PAGE_BASE, node)
            if _PROF != "nodma":
                _leaf_dma(tris_hbm, tscratch, sems, nq, first).start()
            lq_ref[nq * 3] = first
            lq_ref[nq * 3 + 1] = count
            lq_ref[nq * 3 + 2] = this
            b6 = _node_box6(this)
            for k in range(6):
                lbox_ref[nq * 6 + k] = b6[k]
            if stats_ref is not None:
                stats_ref[0, 0, 1] = stats_ref[0, 0, 1] + 1
            return sp, nq + 1  # (kept verbatim for the paged walk)

        def inner_case(args):
            sp, nq = args
            sgn = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))
            bit = fnode ^ sgn
            near = child + bit
            far = child + 1 - bit
            if nm_ref is None:
                pf = itest(_node_box6(far), maxb)
                pn = itest(_node_box6(near), maxb)
            elif pages is None:
                # dense pre-pass did the interval math on the VPU
                pf = _nm_bit(nm_ref, far)
                pn = _nm_bit(nm_ref, near)
            else:
                # the XLA mask pass covers page-local nodes too (their
                # mask index = mk_off + page*mk_cap + local id, tracked
                # per cached slot in ptag_ref[PG_SLOTS + 1])
                base = jnp.where(in_pg, ptag_ref[PG_SLOTS + 1], 0)
                pf = _nm_bit(nm_ref, base + far)
                pn = _nm_bit(nm_ref, base + near)
            if pages is not None:
                base = jnp.where(in_pg, PAGE_BASE, 0)
                near = base + near
                far = base + far
            stack_ref[sp] = far
            sp = sp + pf.astype(jnp.int32)
            stack_ref[sp] = near
            sp = sp + pn.astype(jnp.int32)
            return sp, nq

        if pages is None:
            sp, nq = jax.lax.cond(count > 0, leaf_case, inner_case, (sp, nq))
            return sp, nq, maxb

        def enter_page(args):
            # page fault into the direct-mapped cache; tag hit skips the
            # DMA entirely (the SPU software cache, spu/base.h:85-135)
            sp, nq = args
            slot = child & (PG_SLOTS - 1)

            @pl.when(ptag_ref[slot] != child)
            def _():
                cm = pltpu.make_async_copy(
                    pg_meta_hbm.at[child],
                    pmeta_ref.at[pl.ds(slot * 8, 8), :], psem.at[0])
                cb = pltpu.make_async_copy(
                    pg_box_hbm.at[child],
                    pbox_ref.at[pl.ds(slot * 8, 8), :], psem.at[1])
                cm.start()
                cb.start()
                cm.wait()
                cb.wait()
                ptag_ref[slot] = child
                if stats_ref is not None:
                    stats_ref[0, 0, 5] = stats_ref[0, 0, 5] + 1

            ptag_ref[PG_SLOTS] = slot
            ptag_ref[PG_SLOTS + 1] = mk_off + child * mk_cap
            stack_ref[sp] = PAGE_BASE
            if stats_ref is not None:
                stats_ref[0, 0, 6] = stats_ref[0, 0, 6] + 1
            return sp + 1, nq

        is_ptr = jnp.logical_not(in_pg) & (axis == 3)
        sp, nq = jax.lax.cond(
            is_ptr,
            enter_page,
            lambda args: jax.lax.cond(count > 0, leaf_case, inner_case,
                                      args),
            (sp, nq),
        )
        return sp, nq, maxb

    chunk_drain = _make_chunk_drain(
        o, idir, lim_fn, process_fn, tris_hbm, tscratch, sems,
        lq_ref, bits_ref, qlist_ref, stats_ref,
        box_ref=box_ref if use2 else None,
        lbox_ref=None if use2 else lbox_ref,
    )

    # v2 needs a root that is an inner node (leaf children are reached
    # through their parent); single-node scenes keep the v1 walk. The
    # node count is static (tbl shape), so this is a trace-time choice.
    root_ok = itest(_box6(box_ref, 0), maxb0)
    if _PROF == "nowalk":  # ablation: raygen/init/prologue/outputs only
        root_ok = root_ok & (maxb0 < -1e30)
    if use2:
        # register-resident current node: top = -1 <=> walk exhausted

        def outer_body2(carry):
            top, sp, maxb = carry
            top, sp, nq, _ = jax.lax.while_loop(
                lambda c: (c[0] >= 0) & (c[2] < NBUF - 1), walk_body2,
                (top, sp, 0, maxb)
            )
            return top, sp, chunk_drain(nq, maxb)

        top0 = jnp.where(root_ok, 0, -1)
        jax.lax.while_loop(
            lambda c: (c[0] >= 0) & (c[2] > 0.0), outer_body2,
            (top0, jnp.int32(0), maxb0)
        )
        return

    def outer_body(carry):
        sp, maxb = carry
        sp, nq, _ = jax.lax.while_loop(
            lambda c: (c[0] > 0) & (c[1] < NBUF), walk_body, (sp, 0, maxb)
        )
        return sp, chunk_drain(nq, maxb)

    stack_ref[0] = 0
    sp0 = root_ok.astype(jnp.int32)
    jax.lax.while_loop(
        lambda c: (c[0] > 0) & (c[1] > 0.0), outer_body, (sp0, maxb0)
    )


def _closest_ival_drain(d_refs, tscratch,
                        best_ref, bu_ref, bv_ref, tri_ref):
    """Closest-hit leaf processing (VPU, quarter-granular).

    The per-leaf per-quarter cull (against the CURRENT per-ray best)
    happens batched inside _traverse_ival via lim_fn; process_fn runs
    only for (leaf, quarter) pairs that survive it, on that quarter's
    (QR, 128) rows alone. ``d_refs`` are (RAY_SUB, 128) refs of the ray
    dirs (values can't be row-sliced dynamically; refs can). The staged
    rows are shared_rows output (origin terms folded per frame) — a
    raw-triangle drain with the origin as broadcast scalars was tried
    in round 4 and measured ~+12 ms/frame (the ~20 extra small-vector
    ops per 4-tri block cost ~3x their op count in dependency stalls),
    while shared_rows itself is <0.5 ms inside the frame jit."""

    def lim_fn():
        return best_ref[:, :]

    def process_fn(slot, first, count, q):
        ts = tscratch.at[slot]
        # q is a python int (static) or None: plain static slices
        r = slice(0, RAY_SUB) if q is None else slice(q * QR, q * QR + QR)
        d = (d_refs[0][r, :], d_refs[1][r, :], d_refs[2][r, :])
        for blk in range(IVAL_LEAF // 4):
            r0 = blk * 4

            @pl.when(r0 < count)
            def _(r0=r0):
                det, u, v, tmul = _intersect4_sh(d, _tri_cols_sh(ts, r0))
                duv = det - u - v
                side = (jnp.maximum(u, jnp.maximum(v, duv)) <= 0.0) | (
                    jnp.minimum(u, jnp.minimum(v, duv)) >= 0.0
                )
                idet = 1.0 / jnp.where(det == 0.0, 1e-30, det)
                dist = tmul * idet
                row = jax.lax.broadcasted_iota(jnp.int32, (4, 1, 1), 0)
                ok = side & (det != 0.0) & (dist > 0.0) & ((r0 + row) < count)
                dist = jnp.where(ok, dist, BIG)
                m = jnp.min(dist, axis=0)  # (QR, 128)
                upd = m < best_ref[r, :]
                is_min = (dist == m[None]) & ok
                ids = first + r0 + row
                tid = jnp.min(
                    jnp.where(is_min, ids, jnp.int32(2**30)), axis=0
                )
                sel_u = jnp.max(jnp.where(is_min, u * idet, -BIG), axis=0)
                sel_v = jnp.max(jnp.where(is_min, v * idet, -BIG), axis=0)
                best_ref[r, :] = jnp.where(upd, m, best_ref[r, :])
                tri_ref[r, :] = jnp.where(upd, tid, tri_ref[r, :])
                bu_ref[r, :] = jnp.where(upd, sel_u, bu_ref[r, :])
                bv_ref[r, :] = jnp.where(upd, sel_v, bv_ref[r, :])

    return lim_fn, process_fn


def _shadow_ival_drain(d_refs, tm_ref, limit, tscratch, blocked_ref):
    """Any-hit leaf processing, quarter-granular; the open-rays-only limit
    doubles as the batched per-leaf cull and the full-occlusion
    early-exit bound. ``tm_ref`` is the (1, RAY_SUB, 128) tmax input ref
    (re-sliced per quarter instead of dynamic-slicing the value)."""

    def lim_fn():
        return jnp.where(blocked_ref[:, :] > 0.0, -BIG, limit)

    def process_fn(slot, first, count, q):
        ts = tscratch.at[slot]
        # q is a python int (static) or None: plain static slices
        r = slice(0, RAY_SUB) if q is None else slice(q * QR, q * QR + QR)
        d = (d_refs[0][r, :], d_refs[1][r, :], d_refs[2][r, :])
        tmq = tm_ref[0, r, :]
        limq = jnp.where(tmq >= 0.0, tmq, -BIG)
        for blk in range(IVAL_LEAF // 4):
            r0 = blk * 4

            @pl.when(r0 < count)
            def _(r0=r0):
                det, u, v, tmul = _intersect4_sh(d, _tri_cols_sh(ts, r0))
                row = jax.lax.broadcasted_iota(jnp.int32, (4, 1, 1), 0)
                occ = (
                    (jnp.minimum(u, v) >= 0.0)
                    & (u + v <= det)
                    & (tmul > 0.0)
                    & (tmul < limq[None] * det)
                    & ((r0 + row) < count)
                )
                occ_any = jnp.max(jnp.where(occ, 1.0, 0.0), axis=0)
                blocked_ref[r, :] = jnp.maximum(blocked_ref[r, :], occ_any)

    return lim_fn, process_fn


def _camera_ival_impl(tbl_ref, box_ref, cam_ref, tris_hbm,
                      dist_ref, u_ref, v_ref, tri_out,
                      dx_ref, dy_ref, dz_ref,
                      best_ref, bu_ref, bv_ref, tri_ref,
                      tscratch, stack_ref, lq_ref, bits_ref, qlist_ref,
                      lbox_ref, sems, nm_ref,
                      stats_ref, pages=None):
    """Primary rays: camera-fused raygen + decoupled interval traversal.

    cam layout as _camera_kernel (f32[16])."""
    pid = pl.program_id(0)
    tiles_x = cam_ref[15].astype(jnp.int32)
    tx = pid % tiles_x
    ty = pid // tiles_x

    px, py = _pixel_xy(tx, ty)
    x = (px + 0.5 - cam_ref[12]) * cam_ref[14]
    y = (cam_ref[13] - py - 0.5) * cam_ref[14]

    dx = cam_ref[0] * x + cam_ref[3] * y + cam_ref[6]
    dy = cam_ref[1] * x + cam_ref[4] * y + cam_ref[7]
    dz = cam_ref[2] * x + cam_ref[5] * y + cam_ref[8]
    inv_len = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    dx = dx * inv_len
    dy = dy * inv_len
    dz = dz * inv_len

    o = (cam_ref[9], cam_ref[10], cam_ref[11])
    d = (dx, dy, dz)
    idir = tuple(1.0 / (c + 1e-8) for c in d)
    bnds, signs = _ival_bounds(idir)

    # Cap each ray's working bound at its root-box EXIT distance: rays
    # that miss everything then stop holding the packet's scalar bound
    # (and the per-leaf culls) at BIG. Hits are tracked via tri >= 0.
    rlo, rhi = _box(box_ref, 0)
    t1 = tuple((rlo[k] - o[k]) * idir[k] for k in range(3))
    t2 = tuple((rhi[k] - o[k]) * idir[k] for k in range(3))
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t1[0], t2[0]), jnp.maximum(t1[1], t2[1])),
        jnp.maximum(t1[2], t2[2]),
    )
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t1[0], t2[0]), jnp.minimum(t1[1], t2[1])),
        jnp.minimum(t1[2], t2[2]),
    )
    t_exit = jnp.where((tn <= tf) & (tf > 0.0), tf * 1.0001, 0.0)

    best_ref[:, :] = t_exit
    bu_ref[:, :] = jnp.zeros((RAY_SUB, RAY_LANE), jnp.float32)
    bv_ref[:, :] = jnp.zeros((RAY_SUB, RAY_LANE), jnp.float32)
    tri_ref[:, :] = jnp.full((RAY_SUB, RAY_LANE), -1, jnp.int32)

    # dir outputs are written up front so the drain can take dynamic
    # quarter-row slices of them (refs slice; in-register values don't)
    dx_ref[0] = dx
    dy_ref[0] = dy
    dz_ref[0] = dz
    d_refs = (dx_ref.at[0], dy_ref.at[0], dz_ref.at[0])

    maxb0 = jnp.max(t_exit)
    lim_fn, process_fn = _closest_ival_drain(
        d_refs, tscratch, best_ref, bu_ref, bv_ref, tri_ref)
    itest = lambda box6, maxb: _ival_test_vals(box6, o, bnds, maxb)
    _traverse_ival(tbl_ref, box_ref, o, idir, itest, signs, maxb0,
                   lim_fn, process_fn,
                   tris_hbm, tscratch, sems, stack_ref, lq_ref, bits_ref,
                   qlist_ref, lbox_ref, stats_ref, pages, nm_ref)

    dist_ref[0] = jnp.where(tri_ref[:, :] >= 0, best_ref[:, :], BIG)
    u_ref[0] = bu_ref[:, :]
    v_ref[0] = bv_ref[:, :]
    tri_out[0] = tri_ref[:, :]


def _camera_ival_kernel(tbl_hbm, box_hbm, cam_ref, masks_hbm, tris_hbm,
                        dist_ref, u_ref, v_ref, tri_out,
                        dx_ref, dy_ref, dz_ref,
                        best_ref, bu_ref, bv_ref, tri_ref,
                        tscratch, stack_ref, lq_ref, bits_ref, qlist_ref,
                        lbox_ref, sems,
                        tbl_s, box_s, mask_s, ssem):
    _stage_tables(tbl_hbm, box_hbm, tbl_s, box_s, ssem)
    if _NMASK:
        _load_mask(masks_hbm, mask_s, ssem)
    nm = mask_s if _NMASK else None
    _camera_ival_impl(tbl_s, box_s, cam_ref, tris_hbm,
                      dist_ref, u_ref, v_ref, tri_out,
                      dx_ref, dy_ref, dz_ref,
                      best_ref, bu_ref, bv_ref, tri_ref,
                      tscratch, stack_ref, lq_ref, bits_ref, qlist_ref,
                      lbox_ref, sems, nm, None)


def _camera_ival_kernel_paged(tbl_hbm, box_hbm, cam_ref, masks_hbm,
                              tris_hbm, pg_meta_hbm, pg_box_hbm,
                              dist_ref, u_ref, v_ref, tri_out,
                              dx_ref, dy_ref, dz_ref,
                              best_ref, bu_ref, bv_ref, tri_ref,
                              tscratch, stack_ref, lq_ref, bits_ref,
                              qlist_ref, lbox_ref, sems,
                              pmeta_ref, pbox_ref, ptag_ref, psem,
                              tbl_s, box_s, mask_s, ssem,
                              *, mk_off, mk_cap):
    _stage_tables(tbl_hbm, box_hbm, tbl_s, box_s, ssem)
    if _NMASK:
        _load_mask(masks_hbm, mask_s, ssem)
    nm = mask_s if _NMASK else None
    _camera_ival_impl(tbl_s, box_s, cam_ref, tris_hbm,
                      dist_ref, u_ref, v_ref, tri_out,
                      dx_ref, dy_ref, dz_ref,
                      best_ref, bu_ref, bv_ref, tri_ref,
                      tscratch, stack_ref, lq_ref, bits_ref, qlist_ref,
                      lbox_ref, sems, nm, None,
                      (pg_meta_hbm, pg_box_hbm, pmeta_ref, pbox_ref,
                       ptag_ref, psem, mk_off, mk_cap))


def _camera_ival_kernel_stats(tbl_hbm, box_hbm, cam_ref, masks_hbm,
                              tris_hbm,
                              dist_ref, u_ref, v_ref, tri_out,
                              dx_ref, dy_ref, dz_ref, st_ref,
                              best_ref, bu_ref, bv_ref, tri_ref,
                              tscratch, stack_ref, lq_ref, bits_ref,
                              qlist_ref, lbox_ref, sems,
                              tbl_s, box_s, mask_s, ssem):
    """Counter-instrumented variant (TreeStats, tree_stats.h:36-130)."""
    _stage_tables(tbl_hbm, box_hbm, tbl_s, box_s, ssem)
    if _NMASK:
        _load_mask(masks_hbm, mask_s, ssem)
    nm = mask_s if _NMASK else None
    _camera_ival_impl(tbl_s, box_s, cam_ref, tris_hbm,
                      dist_ref, u_ref, v_ref, tri_out,
                      dx_ref, dy_ref, dz_ref,
                      best_ref, bu_ref, bv_ref, tri_ref,
                      tscratch, stack_ref, lq_ref, bits_ref, qlist_ref,
                      lbox_ref, sems, nm, st_ref)


def _shadow_ival_impl(tbl_ref, box_ref, orig_ref,
                      dx_ref, dy_ref, dz_ref, tm_ref, tris_hbm,
                      out_ref, blocked_ref,
                      tscratch, stack_ref, lq_ref, bits_ref, qlist_ref,
                      lbox_ref, sems, nm_ref,
                      stats_ref, pages=None):
    """Shadow any-hit from the shared light origin, interval traversal."""
    o = (orig_ref[0], orig_ref[1], orig_ref[2])
    d = (dx_ref[0], dy_ref[0], dz_ref[0])
    tmax = tm_ref[0]
    idir = tuple(1.0 / (c + 1e-8) for c in d)
    bnds, signs = _ival_bounds(idir)

    active = tmax >= 0.0
    blocked_ref[:, :] = jnp.zeros(tmax.shape, jnp.float32)
    limit = jnp.where(active, tmax, -BIG)
    maxb0 = jnp.max(limit)
    d_refs = (dx_ref.at[0], dy_ref.at[0], dz_ref.at[0])
    lim_fn, process_fn = _shadow_ival_drain(d_refs, tm_ref, limit,
                                            tscratch, blocked_ref)
    itest = lambda box6, maxb: _ival_test_vals(box6, o, bnds, maxb)
    _traverse_ival(tbl_ref, box_ref, o, idir, itest, signs, maxb0,
                   lim_fn, process_fn,
                   tris_hbm, tscratch, sems, stack_ref, lq_ref, bits_ref,
                   qlist_ref, lbox_ref, stats_ref, pages, nm_ref)
    out_ref[0] = blocked_ref[:, :]


def _shadow_ival_kernel(tbl_hbm, box_hbm, orig_ref, masks_hbm,
                        dx_ref, dy_ref, dz_ref, tm_ref, tris_hbm,
                        out_ref, blocked_ref,
                        tscratch, stack_ref, lq_ref, bits_ref, qlist_ref,
                        lbox_ref, sems,
                        tbl_s, box_s, mask_s, ssem):
    _stage_tables(tbl_hbm, box_hbm, tbl_s, box_s, ssem)
    if _NMASK:
        _load_mask(masks_hbm, mask_s, ssem)
    nm = mask_s if _NMASK else None
    _shadow_ival_impl(tbl_s, box_s, orig_ref,
                      dx_ref, dy_ref, dz_ref, tm_ref, tris_hbm,
                      out_ref, blocked_ref,
                      tscratch, stack_ref, lq_ref, bits_ref, qlist_ref,
                      lbox_ref, sems, nm, None)


def _shadow_ival_kernel_paged(tbl_hbm, box_hbm, orig_ref, masks_hbm,
                              dx_ref, dy_ref, dz_ref, tm_ref, tris_hbm,
                              pg_meta_hbm, pg_box_hbm,
                              out_ref, blocked_ref,
                              tscratch, stack_ref, lq_ref, bits_ref,
                              qlist_ref, lbox_ref, sems,
                              pmeta_ref, pbox_ref, ptag_ref, psem,
                              tbl_s, box_s, mask_s, ssem,
                              *, mk_off, mk_cap):
    _stage_tables(tbl_hbm, box_hbm, tbl_s, box_s, ssem)
    if _NMASK:
        _load_mask(masks_hbm, mask_s, ssem)
    nm = mask_s if _NMASK else None
    _shadow_ival_impl(tbl_s, box_s, orig_ref,
                      dx_ref, dy_ref, dz_ref, tm_ref, tris_hbm,
                      out_ref, blocked_ref,
                      tscratch, stack_ref, lq_ref, bits_ref, qlist_ref,
                      lbox_ref, sems, nm, None,
                      (pg_meta_hbm, pg_box_hbm, pmeta_ref, pbox_ref,
                       ptag_ref, psem, mk_off, mk_cap))


def _shadow_ival_kernel_stats(tbl_hbm, box_hbm, orig_ref, masks_hbm,
                              dx_ref, dy_ref, dz_ref, tm_ref, tris_hbm,
                              out_ref, st_ref, blocked_ref,
                              tscratch, stack_ref, lq_ref, bits_ref,
                              qlist_ref, lbox_ref, sems,
                              tbl_s, box_s, mask_s, ssem):
    _stage_tables(tbl_hbm, box_hbm, tbl_s, box_s, ssem)
    if _NMASK:
        _load_mask(masks_hbm, mask_s, ssem)
    nm = mask_s if _NMASK else None
    _shadow_ival_impl(tbl_s, box_s, orig_ref,
                      dx_ref, dy_ref, dz_ref, tm_ref, tris_hbm,
                      out_ref, blocked_ref,
                      tscratch, stack_ref, lq_ref, bits_ref, qlist_ref,
                      lbox_ref, sems, nm, st_ref)


# ---------------------------------------------------------------------------
# General per-ray-origin interval kernels (closest + any-hit), flat & paged
#
# The wavefront bounce/occlusion kernels: same decoupled scalar walk +
# node-mask pre-pass + leaf DMA ring as the shared-origin kernels, but the
# packet interval carries an ORIGIN interval too (_ival_bounds_g — the
# reference's full RayInterval, ray_group.h:293-338) and leaves intersect
# with the full Moller test (no shared-origin precompute). This is what
# lets reflection/transparency rays traverse paged (any-size) scenes in
# Pallas — the reference's traversal has no scene-size cap either
# (bvh/traverse.cpp:14-149, scene_inl.h:434-458).
#
# Callers MUST substitute masked rays' origin/dir with values inside the
# packet's live cone (closest_hit_c does): garbage origins (e.g. miss
# points at BIG) would blow the packet interval open and kill every cull.
# ---------------------------------------------------------------------------


def _closest_ival_drain_g(o_refs, d_refs, tscratch,
                          best_ref, bu_ref, bv_ref, tri_ref):
    """Closest-hit leaf processing with per-ray origins (full Moller,
    _intersect4), quarter-granular like _closest_ival_drain."""

    def lim_fn():
        return best_ref[:, :]

    def process_fn(slot, first, count, q):
        ts = tscratch.at[slot]
        # q is a python int (static) or None: plain static slices
        r = slice(0, RAY_SUB) if q is None else slice(q * QR, q * QR + QR)
        o = (o_refs[0][r, :], o_refs[1][r, :], o_refs[2][r, :])
        d = (d_refs[0][r, :], d_refs[1][r, :], d_refs[2][r, :])
        for blk in range(IVAL_LEAF // 4):
            r0 = blk * 4

            @pl.when(r0 < count)
            def _(r0=r0):
                det, u, v, tmul = _intersect4(o, d, _tri_cols(ts, r0))
                duv = det - u - v
                side = (jnp.maximum(u, jnp.maximum(v, duv)) <= 0.0) | (
                    jnp.minimum(u, jnp.minimum(v, duv)) >= 0.0
                )
                idet = 1.0 / jnp.where(det == 0.0, 1e-30, det)
                dist = tmul * idet
                row = jax.lax.broadcasted_iota(jnp.int32, (4, 1, 1), 0)
                ok = side & (det != 0.0) & (dist > 0.0) & ((r0 + row) < count)
                dist = jnp.where(ok, dist, BIG)
                m = jnp.min(dist, axis=0)
                upd = m < best_ref[r, :]
                is_min = (dist == m[None]) & ok
                ids = first + r0 + row
                tid = jnp.min(
                    jnp.where(is_min, ids, jnp.int32(2**30)), axis=0
                )
                sel_u = jnp.max(jnp.where(is_min, u * idet, -BIG), axis=0)
                sel_v = jnp.max(jnp.where(is_min, v * idet, -BIG), axis=0)
                best_ref[r, :] = jnp.where(upd, m, best_ref[r, :])
                tri_ref[r, :] = jnp.where(upd, tid, tri_ref[r, :])
                bu_ref[r, :] = jnp.where(upd, sel_u, bu_ref[r, :])
                bv_ref[r, :] = jnp.where(upd, sel_v, bv_ref[r, :])

    return lim_fn, process_fn


def _shadow_ival_drain_g(o_refs, d_refs, tm_ref, limit, tscratch,
                         blocked_ref):
    """Any-hit leaf processing with per-ray origins (single-sided shadow
    rule, triangle.cpp:95-96), quarter-granular."""

    def lim_fn():
        return jnp.where(blocked_ref[:, :] > 0.0, -BIG, limit)

    def process_fn(slot, first, count, q):
        ts = tscratch.at[slot]
        # q is a python int (static) or None: plain static slices
        r = slice(0, RAY_SUB) if q is None else slice(q * QR, q * QR + QR)
        o = (o_refs[0][r, :], o_refs[1][r, :], o_refs[2][r, :])
        d = (d_refs[0][r, :], d_refs[1][r, :], d_refs[2][r, :])
        limq = tm_ref[0, r, :]
        limq = jnp.where(limq >= 0.0, limq, -BIG)
        for blk in range(IVAL_LEAF // 4):
            r0 = blk * 4

            @pl.when(r0 < count)
            def _(r0=r0):
                det, u, v, tmul = _intersect4(o, d, _tri_cols(ts, r0))
                row = jax.lax.broadcasted_iota(jnp.int32, (4, 1, 1), 0)
                occ = (
                    (jnp.minimum(u, v) >= 0.0)
                    & (u + v <= det)
                    & (tmul > 0.0)
                    & (tmul < limq[None] * det)
                    & ((r0 + row) < count)
                )
                occ_any = jnp.max(jnp.where(occ, 1.0, 0.0), axis=0)
                blocked_ref[r, :] = jnp.maximum(blocked_ref[r, :], occ_any)

    return lim_fn, process_fn


def _closest_ival_drain_sh_raw(o, d_refs, tscratch,
                               best_ref, bu_ref, bv_ref, tri_ref):
    """Closest-hit leaf processing from a SHARED origin with RAW
    triangle rows (full Moller; the origin scalars broadcast inside
    _intersect4). Used for huge scenes where the per-frame shared_rows
    table would double a multi-GB triangle array in HBM (a 10 Mtri
    scene OOMed at 28.8 G with it)."""

    def lim_fn():
        return best_ref[:, :]

    def process_fn(slot, first, count, q):
        ts = tscratch.at[slot]
        r = slice(0, RAY_SUB) if q is None else slice(q * QR, q * QR + QR)
        d = (d_refs[0][r, :], d_refs[1][r, :], d_refs[2][r, :])
        for blk in range(IVAL_LEAF // 4):
            r0 = blk * 4

            @pl.when(r0 < count)
            def _(r0=r0):
                det, u, v, tmul = _intersect4(o, d, _tri_cols(ts, r0))
                duv = det - u - v
                side = (jnp.maximum(u, jnp.maximum(v, duv)) <= 0.0) | (
                    jnp.minimum(u, jnp.minimum(v, duv)) >= 0.0
                )
                idet = 1.0 / jnp.where(det == 0.0, 1e-30, det)
                dist = tmul * idet
                row = jax.lax.broadcasted_iota(jnp.int32, (4, 1, 1), 0)
                ok = side & (det != 0.0) & (dist > 0.0) & ((r0 + row) < count)
                dist = jnp.where(ok, dist, BIG)
                m = jnp.min(dist, axis=0)
                upd = m < best_ref[r, :]
                is_min = (dist == m[None]) & ok
                ids = first + r0 + row
                tid = jnp.min(
                    jnp.where(is_min, ids, jnp.int32(2**30)), axis=0
                )
                sel_u = jnp.max(jnp.where(is_min, u * idet, -BIG), axis=0)
                sel_v = jnp.max(jnp.where(is_min, v * idet, -BIG), axis=0)
                best_ref[r, :] = jnp.where(upd, m, best_ref[r, :])
                tri_ref[r, :] = jnp.where(upd, tid, tri_ref[r, :])
                bu_ref[r, :] = jnp.where(upd, sel_u, bu_ref[r, :])
                bv_ref[r, :] = jnp.where(upd, sel_v, bv_ref[r, :])

    return lim_fn, process_fn


def _shadow_ival_drain_sh_raw(o, d_refs, tm_ref, limit, tscratch,
                              blocked_ref):
    """Any-hit leaf processing from a shared origin with raw triangle
    rows (see _closest_ival_drain_sh_raw)."""

    def lim_fn():
        return jnp.where(blocked_ref[:, :] > 0.0, -BIG, limit)

    def process_fn(slot, first, count, q):
        ts = tscratch.at[slot]
        r = slice(0, RAY_SUB) if q is None else slice(q * QR, q * QR + QR)
        d = (d_refs[0][r, :], d_refs[1][r, :], d_refs[2][r, :])
        limq = tm_ref[0, r, :]
        limq = jnp.where(limq >= 0.0, limq, -BIG)
        for blk in range(IVAL_LEAF // 4):
            r0 = blk * 4

            @pl.when(r0 < count)
            def _(r0=r0):
                det, u, v, tmul = _intersect4(o, d, _tri_cols(ts, r0))
                row = jax.lax.broadcasted_iota(jnp.int32, (4, 1, 1), 0)
                occ = (
                    (jnp.minimum(u, v) >= 0.0)
                    & (u + v <= det)
                    & (tmul > 0.0)
                    & (tmul < limq[None] * det)
                    & ((r0 + row) < count)
                )
                occ_any = jnp.max(jnp.where(occ, 1.0, 0.0), axis=0)
                blocked_ref[r, :] = jnp.maximum(blocked_ref[r, :], occ_any)

    return lim_fn, process_fn


def _closest_ival_impl_g(tbl_ref, box_ref,
                         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                         tm_ref, tris_hbm,
                         dist_ref, u_ref, v_ref, tri_out,
                         best_ref, bu_ref, bv_ref, tri_ref,
                         tscratch, stack_ref, lq_ref, bits_ref, qlist_ref,
                         lbox_ref, sems, nm_ref,
                         pages=None):
    o = (ox_ref[0], oy_ref[0], oz_ref[0])
    d = (dx_ref[0], dy_ref[0], dz_ref[0])
    tmax = tm_ref[0]
    idir = tuple(1.0 / (c + 1e-8) for c in d)
    bnds, signs = _ival_bounds_g(o, idir)

    active = tmax >= 0.0
    best_ref[:, :] = jnp.where(active, jnp.minimum(tmax, BIG), -BIG)
    bu_ref[:, :] = jnp.zeros_like(tmax)
    bv_ref[:, :] = jnp.zeros_like(tmax)
    tri_ref[:, :] = jnp.full(tmax.shape, -1, jnp.int32)
    maxb0 = jnp.max(best_ref[:, :])

    itest = lambda box6, maxb: _ival_test_vals_g(box6, bnds, maxb)
    o_refs = (ox_ref.at[0], oy_ref.at[0], oz_ref.at[0])
    d_refs = (dx_ref.at[0], dy_ref.at[0], dz_ref.at[0])
    lim_fn, process_fn = _closest_ival_drain_g(
        o_refs, d_refs, tscratch, best_ref, bu_ref, bv_ref, tri_ref)
    _traverse_ival(tbl_ref, box_ref, o, idir, itest, signs, maxb0,
                   lim_fn, process_fn,
                   tris_hbm, tscratch, sems, stack_ref, lq_ref, bits_ref,
                   qlist_ref, lbox_ref, None, pages, nm_ref)

    # tri == -1 -> no hit: BIG for active rays, -BIG sentinel for masked
    hit = tri_ref[:, :] >= 0
    dist_ref[0] = jnp.where(hit, best_ref[:, :],
                            jnp.where(active, BIG, -BIG))
    u_ref[0] = bu_ref[:, :]
    v_ref[0] = bv_ref[:, :]
    tri_out[0] = jnp.maximum(tri_ref[:, :], 0)


def _closest_ival_kernel_g(tbl_hbm, box_hbm, masks_hbm,
                           ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                           tm_ref, tris_hbm,
                           dist_ref, u_ref, v_ref, tri_out,
                           best_ref, bu_ref, bv_ref, tri_ref,
                           tscratch, stack_ref, lq_ref, bits_ref, qlist_ref,
                           lbox_ref, sems,
                           tbl_s, box_s, mask_s, ssem):
    _stage_tables(tbl_hbm, box_hbm, tbl_s, box_s, ssem)
    if _NMASK:
        _load_mask(masks_hbm, mask_s, ssem)
    nm = mask_s if _NMASK else None
    _closest_ival_impl_g(tbl_s, box_s,
                         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                         tm_ref, tris_hbm,
                         dist_ref, u_ref, v_ref, tri_out,
                         best_ref, bu_ref, bv_ref, tri_ref,
                         tscratch, stack_ref, lq_ref, bits_ref, qlist_ref,
                         lbox_ref, sems, nm, None)


def _closest_ival_kernel_g_paged(tbl_hbm, box_hbm, masks_hbm,
                                 ox_ref, oy_ref, oz_ref,
                                 dx_ref, dy_ref, dz_ref,
                                 tm_ref, tris_hbm, pg_meta_hbm, pg_box_hbm,
                                 dist_ref, u_ref, v_ref, tri_out,
                                 best_ref, bu_ref, bv_ref, tri_ref,
                                 tscratch, stack_ref, lq_ref, bits_ref,
                                 qlist_ref, lbox_ref, sems,
                                 pmeta_ref, pbox_ref, ptag_ref, psem,
                                 tbl_s, box_s, mask_s, ssem,
                                 *, mk_off, mk_cap):
    _stage_tables(tbl_hbm, box_hbm, tbl_s, box_s, ssem)
    if _NMASK:
        _load_mask(masks_hbm, mask_s, ssem)
    nm = mask_s if _NMASK else None
    _closest_ival_impl_g(tbl_s, box_s,
                         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                         tm_ref, tris_hbm,
                         dist_ref, u_ref, v_ref, tri_out,
                         best_ref, bu_ref, bv_ref, tri_ref,
                         tscratch, stack_ref, lq_ref, bits_ref, qlist_ref,
                         lbox_ref, sems, nm,
                         (pg_meta_hbm, pg_box_hbm, pmeta_ref, pbox_ref,
                          ptag_ref, psem, mk_off, mk_cap))


def _shadow_ival_impl_g(tbl_ref, box_ref,
                        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                        tm_ref, tris_hbm,
                        out_ref, blocked_ref,
                        tscratch, stack_ref, lq_ref, bits_ref, qlist_ref,
                        lbox_ref, sems, nm_ref,
                        pages=None):
    o = (ox_ref[0], oy_ref[0], oz_ref[0])
    d = (dx_ref[0], dy_ref[0], dz_ref[0])
    tmax = tm_ref[0]
    idir = tuple(1.0 / (c + 1e-8) for c in d)
    bnds, signs = _ival_bounds_g(o, idir)

    active = tmax >= 0.0
    blocked_ref[:, :] = jnp.zeros(tmax.shape, jnp.float32)
    limit = jnp.where(active, tmax, -BIG)
    maxb0 = jnp.max(limit)

    itest = lambda box6, maxb: _ival_test_vals_g(box6, bnds, maxb)
    o_refs = (ox_ref.at[0], oy_ref.at[0], oz_ref.at[0])
    d_refs = (dx_ref.at[0], dy_ref.at[0], dz_ref.at[0])
    lim_fn, process_fn = _shadow_ival_drain_g(
        o_refs, d_refs, tm_ref, limit, tscratch, blocked_ref)
    _traverse_ival(tbl_ref, box_ref, o, idir, itest, signs, maxb0,
                   lim_fn, process_fn,
                   tris_hbm, tscratch, sems, stack_ref, lq_ref, bits_ref,
                   qlist_ref, lbox_ref, None, pages, nm_ref)
    out_ref[0] = blocked_ref[:, :]


def _shadow_ival_kernel_g(tbl_hbm, box_hbm, masks_hbm,
                          ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                          tm_ref, tris_hbm,
                          out_ref, blocked_ref,
                          tscratch, stack_ref, lq_ref, bits_ref, qlist_ref,
                          lbox_ref, sems,
                          tbl_s, box_s, mask_s, ssem):
    _stage_tables(tbl_hbm, box_hbm, tbl_s, box_s, ssem)
    if _NMASK:
        _load_mask(masks_hbm, mask_s, ssem)
    nm = mask_s if _NMASK else None
    _shadow_ival_impl_g(tbl_s, box_s,
                        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                        tm_ref, tris_hbm,
                        out_ref, blocked_ref,
                        tscratch, stack_ref, lq_ref, bits_ref, qlist_ref,
                        lbox_ref, sems, nm, None)


def _shadow_ival_kernel_g_paged(tbl_hbm, box_hbm, masks_hbm,
                                ox_ref, oy_ref, oz_ref,
                                dx_ref, dy_ref, dz_ref,
                                tm_ref, tris_hbm, pg_meta_hbm, pg_box_hbm,
                                out_ref, blocked_ref,
                                tscratch, stack_ref, lq_ref, bits_ref,
                                qlist_ref, lbox_ref, sems,
                                pmeta_ref, pbox_ref, ptag_ref, psem,
                                tbl_s, box_s, mask_s, ssem,
                                *, mk_off, mk_cap):
    _stage_tables(tbl_hbm, box_hbm, tbl_s, box_s, ssem)
    if _NMASK:
        _load_mask(masks_hbm, mask_s, ssem)
    nm = mask_s if _NMASK else None
    _shadow_ival_impl_g(tbl_s, box_s,
                        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                        tm_ref, tris_hbm,
                        out_ref, blocked_ref,
                        tscratch, stack_ref, lq_ref, bits_ref, qlist_ref,
                        lbox_ref, sems, nm,
                        (pg_meta_hbm, pg_box_hbm, pmeta_ref, pbox_ref,
                         ptag_ref, psem, mk_off, mk_cap))


def _stage_scratches(meta, box, masks):
    """Persistent staged-table scratches + the per-packet mask rows
    (appended LAST so kernels take them after every other scratch ref)."""
    return [
        pltpu.SMEM((meta.size,), jnp.int32),
        pltpu.SMEM((box.size,), jnp.float32),
        pltpu.SMEM((masks.shape[1], masks.shape[2]), jnp.int32),
        pltpu.SemaphoreType.DMA((3,)),
    ]


def _ival_scratches(extra_vec: int, page_shapes=None):
    base = [
        pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32)
        for _ in range(extra_vec)
    ] + [
        pltpu.VMEM((NBUF, IVAL_LEAF, TRI_ROW), jnp.float32),  # leaf ring
        pltpu.SMEM((STACK_CAP,), jnp.int32),  # stack
        pltpu.SMEM((NBUF * 3,), jnp.int32),  # leaf queue (first, count, node)
        pltpu.SMEM((_BITS_WORDS,), jnp.int32),  # (leaf, quarter) cull bits
        pltpu.SMEM((NBUF * NQ,), jnp.int32),  # compacted survivor list
        pltpu.SMEM((NBUF * 6,), jnp.float32),  # enqueue-time leaf bboxes
        pltpu.SemaphoreType.DMA((NBUF,)),
    ]
    if page_shapes is not None:
        meta_l8, box_l8 = page_shapes  # one page's (8, L8) slot lane dims
        base += [
            pltpu.SMEM((PG_SLOTS * 8, meta_l8), jnp.int32),  # page cache
            pltpu.SMEM((PG_SLOTS * 8, box_l8), jnp.float32),
            pltpu.SMEM((PG_SLOTS + 2,), jnp.int32),  # tags + cur slot
            # + the cached slot's mask-index base
            pltpu.SemaphoreType.DMA((2,)),  # page meta/box DMAs
        ]
    return base


@partial(jax.jit, static_argnames=("p",))
def _run_camera_ival(meta, box, cam, tris, masks, p):
    return pl.pallas_call(
        _camera_ival_kernel,
        grid=(p,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), _smem(), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[_blk()] * 7,
        out_shape=(
            [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.int32)]
            + [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32)] * 3
        ),
        scratch_shapes=(
            [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32)] * 3
            + [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.int32)]
            + _ival_scratches(0)
            + _stage_scratches(meta, box, masks)
        ),
        interpret=_interpret(),
    )(meta, box, cam, masks, tris)


@jax.jit
def _run_shadow_ival(meta, box, orig, dx, dy, dz, tm, tris, masks):
    p = dx.shape[0]
    return pl.pallas_call(
        _shadow_ival_kernel,
        grid=(p,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), _smem(), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        + [_blk()] * 4
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=_blk(),
        out_shape=jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32)]  # blocked
            + _ival_scratches(0)
            + _stage_scratches(meta, box, masks)
        ),
        interpret=_interpret(),
    )(meta, box, orig, masks, dx, dy, dz, tm, tris)


@partial(jax.jit, static_argnames=("p", "mk_off", "mk_cap"))
def _run_camera_ival_paged(meta, box, cam, tris, pg_meta, pg_box, masks, p,
                           mk_off, mk_cap):
    return pl.pallas_call(
        partial(_camera_ival_kernel_paged, mk_off=mk_off, mk_cap=mk_cap),
        grid=(p,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), _smem(), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 3,
        out_specs=[_blk()] * 7,
        out_shape=(
            [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.int32)]
            + [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32)] * 3
        ),
        scratch_shapes=(
            [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32)] * 3
            + [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.int32)]
            + _ival_scratches(
                0, (pg_meta.shape[2], pg_box.shape[2]))
            + _stage_scratches(meta, box, masks)
        ),
        interpret=_interpret(),
    )(meta, box, cam, masks, tris, pg_meta, pg_box)


@partial(jax.jit, static_argnames=("mk_off", "mk_cap"))
def _run_shadow_ival_paged(meta, box, orig, dx, dy, dz, tm, tris,
                           pg_meta, pg_box, masks, mk_off, mk_cap):
    p = dx.shape[0]
    return pl.pallas_call(
        partial(_shadow_ival_kernel_paged, mk_off=mk_off, mk_cap=mk_cap),
        grid=(p,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), _smem(), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        + [_blk()] * 4
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 3,
        out_specs=_blk(),
        out_shape=jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32)]  # blocked
            + _ival_scratches(
                0, (pg_meta.shape[2], pg_box.shape[2]))
            + _stage_scratches(meta, box, masks)
        ),
        interpret=_interpret(),
    )(meta, box, orig, masks, dx, dy, dz, tm, tris, pg_meta, pg_box)


def _stats_spec():
    return pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                        memory_space=pltpu.SMEM)


@partial(jax.jit, static_argnames=("p",))
def _run_camera_ival_stats(meta, box, cam, tris, masks, p):
    return pl.pallas_call(
        _camera_ival_kernel_stats,
        grid=(p,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), _smem(), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[_blk()] * 7 + [_stats_spec()],
        out_shape=(
            [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.int32)]
            + [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((p, 1, 8), jnp.int32)]
        ),
        scratch_shapes=(
            [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32)] * 3
            + [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.int32)]
            + _ival_scratches(0)
            + _stage_scratches(meta, box, masks)
        ),
        interpret=_interpret(),
    )(meta, box, cam, masks, tris)


@jax.jit
def _run_shadow_ival_stats(meta, box, orig, dx, dy, dz, tm, tris, masks):
    p = dx.shape[0]
    return pl.pallas_call(
        _shadow_ival_kernel_stats,
        grid=(p,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), _smem(), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        + [_blk()] * 4
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[_blk(), _stats_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32),
            jax.ShapeDtypeStruct((p, 1, 8), jnp.int32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32)]  # blocked
            + _ival_scratches(0)
            + _stage_scratches(meta, box, masks)
        ),
        interpret=_interpret(),
    )(meta, box, orig, masks, dx, dy, dz, tm, tris)


@jax.jit
def _run_closest_ival_g(meta, box, ox, oy, oz, dx, dy, dz, tm, tris, masks):
    p = ox.shape[0]
    return pl.pallas_call(
        _closest_ival_kernel_g,
        grid=(p,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        + [_blk()] * 7
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[_blk()] * 4,
        out_shape=(
            [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.int32)]
        ),
        scratch_shapes=(
            [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32)] * 3
            + [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.int32)]
            + _ival_scratches(0)
            + _stage_scratches(meta, box, masks)
        ),
        interpret=_interpret(),
    )(meta, box, masks, ox, oy, oz, dx, dy, dz, tm, tris)


@partial(jax.jit, static_argnames=("mk_off", "mk_cap"))
def _run_closest_ival_g_paged(meta, box, ox, oy, oz, dx, dy, dz, tm, tris,
                              pg_meta, pg_box, masks, mk_off, mk_cap):
    p = ox.shape[0]
    return pl.pallas_call(
        partial(_closest_ival_kernel_g_paged, mk_off=mk_off,
                mk_cap=mk_cap),
        grid=(p,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        + [_blk()] * 7
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 3,
        out_specs=[_blk()] * 4,
        out_shape=(
            [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.int32)]
        ),
        scratch_shapes=(
            [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32)] * 3
            + [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.int32)]
            + _ival_scratches(
                0, (pg_meta.shape[2], pg_box.shape[2]))
            + _stage_scratches(meta, box, masks)
        ),
        interpret=_interpret(),
    )(meta, box, masks, ox, oy, oz, dx, dy, dz, tm, tris, pg_meta, pg_box)


@jax.jit
def _run_shadow_ival_g(meta, box, ox, oy, oz, dx, dy, dz, tm, tris, masks):
    p = ox.shape[0]
    return pl.pallas_call(
        _shadow_ival_kernel_g,
        grid=(p,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        + [_blk()] * 7
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=_blk(),
        out_shape=jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32)]  # blocked
            + _ival_scratches(0)
            + _stage_scratches(meta, box, masks)
        ),
        interpret=_interpret(),
    )(meta, box, masks, ox, oy, oz, dx, dy, dz, tm, tris)


@partial(jax.jit, static_argnames=("mk_off", "mk_cap"))
def _run_shadow_ival_g_paged(meta, box, ox, oy, oz, dx, dy, dz, tm, tris,
                             pg_meta, pg_box, masks, mk_off, mk_cap):
    p = ox.shape[0]
    return pl.pallas_call(
        partial(_shadow_ival_kernel_g_paged, mk_off=mk_off,
                mk_cap=mk_cap),
        grid=(p,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM), pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        + [_blk()] * 7
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 3,
        out_specs=_blk(),
        out_shape=jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32)]  # blocked
            + _ival_scratches(
                0, (pg_meta.shape[2], pg_box.shape[2]))
            + _stage_scratches(meta, box, masks)
        ),
        interpret=_interpret(),
    )(meta, box, masks, ox, oy, oz, dx, dy, dz, tm, tris, pg_meta, pg_box)


# ---------------------------------------------------------------------------
# Drain-only worklist traversal (round 5)
#
# The round-4 ablations put the scalar stack walk at ~59% of the forward
# frame (~165 cycles per pop, SMEM-latency-bound) while the counters show
# it enqueues only ~90 leaves per packet on feline 1024^2. The walk is
# pure leaf DISCOVERY: with a BVH, a leaf's own conservative interval
# verdict implies every ancestor's (child boxes are contained in parent
# boxes and the test is monotone in the box), so a dense pass over
# LEAVES alone already knows the exact set of leaves the walk would
# enqueue. These kernels therefore never walk: a FUSED in-kernel leaf
# pass interval-tests every leaf of the scene against the packet's
# interval bounds on the VPU (the planar leaf-box table rides in VMEM),
# packs the verdicts into histogram-equalized near-to-far distance bands
# on the MXU (one dot_general per band emits the bit words TRANSPOSED
# into scalar-readable layout — Mosaic has no lane-compaction shape
# casts, but a (128,128) weight matrix of lane powers of two is exactly
# that compaction, and f32 sums of <= 16 distinct powers below 2^16 are
# exact), DMAs the few-KB word block VMEM->SMEM, and the scalar core
# just scans bits (ctz via clz) into the leaf DMA ring + chunk drain.
# An earlier two-pass variant computed the same words in XLA outside the
# kernel and measured ~15 ms/frame of pure fusion overhead on a 44k-leaf
# scene — in-kernel the pass is all-VMEM and costs ~the flops.
#
# Front-to-back ordering — the only thing the stack order provided —
# survives as the band order plus the band-floor early exit (skip band b
# once max(lim) <= blo[b], exact because bands are assigned by comparing
# tn against those same floor values). Leaf bboxes for the per-ray chunk
# culls arrive by enqueue-time DMA (16 boxes per 128-lane HBM row) so
# nothing per-node ever needs SMEM residence: the same kernels serve a
# 9k-node feline and a 90k-node terrain, and the two-level paged walk
# survives only as the SNAIL_WL=0 fallback.
#
# The reference analogue: this is RayInterval packet culling
# (ray_group.h:293-338, bounding_box.cpp:208-236) hoisted out of the
# per-node recursion into one dense data-parallel pass per packet — the
# TPU-shaped version of "test the packet against every node", which a
# scalar core could never afford but the VPU+MXU do in ~10 us.
# ---------------------------------------------------------------------------

_WL = os.environ.get("SNAIL_WL", "1") != "0"
WL_BANDS = int(os.environ.get("SNAIL_WL_BANDS", 8))  # closest-hit bands
WL_LEAF_CAP = 220_000  # lfc SMEM budget (4 B/leaf)


def pack_leaf_tables(bvh):
    """Host-side leaf tables for the worklist kernels. Returns
    (lf_boxv f32[6, NVL, 8, 128], lfc i32[Lp], boxrows, n_leaf) or None
    when the scene doesn't fit the packing (first-tri >= 2^24, count
    >= 128, or over the lfc SMEM budget).

    lf_boxv: planar leaf boxes in leaf-index order (leaves sorted by
    node id = BVH DFS order, so spatially-adjacent leaves keep adjacent
    bits and the packed words cluster); padding slots are masked in the
    leaf pass. lfc[t] = first<<7 | count. boxrows f32[Lp/16, 128]: leaf
    t's box at lanes (t&15)*8 + k (lo.xyz, hi.xyz, 2 pad) — one 512-B
    DMA per enqueue fetches 16 adjacent leaves' boxes."""
    leaf = np.where(bvh.count > 0)[0]
    first = bvh.child[leaf].astype(np.int64)
    cnt = bvh.count[leaf].astype(np.int64)
    # nv <= 128: the words kernel's summary pack stores one summary word
    # per 1024-leaf block in the LANES of a single row
    if (len(leaf) == 0 or len(leaf) > min(WL_LEAF_CAP, 128 * 1024)
            or first.max() >= (1 << 24) or cnt.max() >= 128):
        return None
    L = len(leaf)
    nv = max(1, -(-L // 1024))
    lp = nv * 1024
    box = np.zeros((lp, 6), np.float32)
    box[:L, 0:3] = bvh.node_lo[leaf]
    box[:L, 3:6] = bvh.node_hi[leaf]
    box[L:, 0:3] = 1e30
    box[L:, 3:6] = -1e30
    lf_boxv = np.ascontiguousarray(box.T.reshape(6, nv, 8, 128))
    lfc = np.zeros(lp, np.int32)
    lfc[:L] = (first << 7) | cnt
    rows = np.zeros((lp // 16, 16, 8), np.float32)
    rows.reshape(-1, 8)[:, :6] = box
    return lf_boxv, lfc, rows.reshape(-1, 128), L


def _wl_block_shape(nv: int, k_bands: int):
    """(rows, lanes) of the per-packet word block: per band 4 word rows
    (word (blk, sb, g) at row b*5+g, lane blk*8+sb; bit p = leaf
    blk*1024 + sb*128 + g*32 + p) + 1 summary row (bit g*8+sb of lane
    blk = word (blk, sb, g) nonzero), plus one trailing band-floor row
    (f32 bits, lane b = blo[b]); rows padded to a multiple of 8 (the
    per-packet HBM->SMEM block DMA needs 8-aligned sublanes)."""
    rp = max(128, -(-nv * 8 // 128) * 128)
    return -(-(k_bands * 5 + 1) // 8) * 8, rp


def _leaf_pass(lf_ref, im, iM, om, oM, mb, k_bands: int, n_leaf: int,
               rp: int):
    """Fused dense leaf pass: interval-test every leaf against the
    packet bounds (values im/iM/om/oM: 3-tuples; mb scalar), assign
    equal-count distance bands, and MXU-pack the verdict bits. Returns
    the (k_bands*5+1, rp) i32 word block (see _wl_block_shape)."""
    nv = lf_ref.shape[1]
    r = nv * 8
    tn = jnp.zeros((nv, 8, 128), jnp.float32)
    tf = jnp.full((nv, 8, 128), mb, jnp.float32)
    for k in range(3):
        a1 = lf_ref[k] - om[k]
        a2 = lf_ref[k] - oM[k]
        c1 = lf_ref[3 + k] - om[k]
        c2 = lf_ref[3 + k] - oM[k]
        lo_min = jnp.minimum(jnp.minimum(a1 * im[k], a1 * iM[k]),
                             jnp.minimum(a2 * im[k], a2 * iM[k]))
        lo_max = jnp.maximum(jnp.maximum(a1 * im[k], a1 * iM[k]),
                             jnp.maximum(a2 * im[k], a2 * iM[k]))
        hi_min = jnp.minimum(jnp.minimum(c1 * im[k], c1 * iM[k]),
                             jnp.minimum(c2 * im[k], c2 * iM[k]))
        hi_max = jnp.maximum(jnp.maximum(c1 * im[k], c1 * iM[k]),
                             jnp.maximum(c2 * im[k], c2 * iM[k]))
        tn = jnp.maximum(tn, jnp.minimum(lo_min, hi_min))
        tf = jnp.minimum(tf, jnp.maximum(lo_max, hi_max))
    # padding slots must NEVER pass: the inverted-box convention is not
    # enough — with a direction interval spanning zero the corner
    # products of +-1e30 straddle +-inf and the conservative test passes
    li = (jax.lax.broadcasted_iota(jnp.int32, (nv, 8, 128), 0) * 1024
          + jax.lax.broadcasted_iota(jnp.int32, (nv, 8, 128), 1) * 128
          + jax.lax.broadcasted_iota(jnp.int32, (nv, 8, 128), 2))
    ok = (tn <= tf) & (tf > 0.0) & (li < n_leaf)

    t0 = jnp.minimum(jnp.min(jnp.where(ok, tn, BIG)), mb)
    span = jnp.maximum(mb - t0, 1e-6)
    if k_bands > 1:
        # histogram-EQUALIZED band edges: linear spacing wastes the
        # front-to-back ordering (for primary rays most passing leaves
        # sit near the camera, all in band 0); equal-count bands keep
        # ~L/K leaves per band so the per-chunk bound refresh prunes
        # like the stack walk's ordered descent did
        nbins = 32
        bidx = jnp.clip(((tn - t0) * (nbins / span)).astype(jnp.int32),
                        0, nbins - 1)
        hist = [jnp.sum(((bidx == j) & ok).astype(jnp.int32))
                for j in range(nbins)]
        c = list(hist)
        for j in range(1, nbins):
            c[j] = c[j] + c[j - 1]
        total = jnp.maximum(c[nbins - 1], 1)
        los = [t0]
        for b in range(1, k_bands):
            tgt = (total * b + k_bands - 1) // k_bands
            e = sum((cj < tgt).astype(jnp.int32) for cj in c)
            los.append(t0 + e.astype(jnp.float32) * (span / nbins))
    else:
        los = [t0]
    band = jnp.zeros((nv, 8, 128), jnp.int32)
    for b in range(1, k_bands):
        band = band + (tn >= los[b]).astype(jnp.int32)

    # MXU pack weights: lane l contributes 2^(l&15) to column l>>5
    # (low 16 word bits, l&16 == 0) or 4 + (l>>5) (high bits)
    l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    pw = jnp.left_shift(1, l & 15).astype(jnp.float32)
    lsel = (cc == jax.lax.shift_right_logical(l, 5)) & (
        (jax.lax.shift_right_logical(l, 4) & 1) == 0)
    hsel = (cc == 4 + jax.lax.shift_right_logical(l, 5)) & (
        (jax.lax.shift_right_logical(l, 4) & 1) == 1)
    wp = jnp.where(lsel | hsel, pw, 0.0)
    l2 = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 1)
    ws = jnp.where(c2 == jax.lax.shift_right_logical(l2, 3),
                   jnp.left_shift(1, l2 & 7).astype(jnp.float32), 0.0)

    rows = []
    for b in range(k_bands):
        okb = ok & (band == b) if k_bands > 1 else ok
        a2 = okb.reshape(nv * 8, 128).astype(jnp.float32)
        pb = jax.lax.dot_general(wp, a2, (((0,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        lo = pb[0:4, :].astype(jnp.int32)
        hi = pb[4:8, :].astype(jnp.int32)
        w32 = lo | jnp.left_shift(hi, 16)  # (4, R)
        nz = (w32 != 0).astype(jnp.float32)
        m = jax.lax.dot_general(nz, ws, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(jnp.int32)  # (4, 128)
        su = (m[0:1] | jnp.left_shift(m[1:2], 8)
              | jnp.left_shift(m[2:3], 16) | jnp.left_shift(m[3:4], 24))
        if rp > r:
            w32 = jnp.pad(w32, ((0, 0), (0, rp - r)))
        su = jnp.pad(su, ((0, 0), (0, rp - 128))) if rp > 128 else \
            su[:, :rp]
        rows.append(jnp.concatenate([w32, su], axis=0))
    # band floors (empty band -> BIG so the skip fires without a scan)
    lb = jax.lax.broadcasted_iota(jnp.int32, (1, rp), 1)
    blo = jnp.full((1, rp), BIG, jnp.float32)
    for b in range(k_bands):
        # nonzero-ness, not max: summary words with bit 31 set are
        # NEGATIVE i32 and a plain max returns 0 from the empty lanes
        any_b = jnp.max(jnp.where(rows[b][4:5, :] != 0, 1, 0))
        blo = jnp.where((lb == b) & (any_b != 0), los[b], blo)
    rows.append(pltpu.bitcast(blo, jnp.int32))
    nrows = k_bands * 5 + 1
    pad_rows = -(-nrows // 8) * 8 - nrows
    if pad_rows:
        rows.append(jnp.zeros((pad_rows, rp), jnp.int32))
    return jnp.concatenate(rows, axis=0)


def _load_wl(wlw_hbm, wl_s, ssem):
    """DMA this packet's word block (the words kernel's output) into
    SMEM. The leaf pass runs in its OWN slim pallas kernel per
    wavefront: fusing it into the trace kernels measured the shadow
    drain section ~3x slower at identical work counts — the pass's MXU/
    hist code evicts the drain loops from the scalar core's instruction
    memory on every scan<->drain alternation."""
    cp = pltpu.make_async_copy(wlw_hbm.at[pl.program_id(0)], wl_s,
                               ssem.at[3])
    cp.start()
    cp.wait()


def _words_camera_kernel(cam_ref, lf_ref, out_ref, *, k_bands: int,
                         n_leaf: int):
    """Per-packet leaf pass for primary rays (raygen mirrored from
    _camera_wl_body; cam f32[22] incl. root box)."""
    pid = pl.program_id(0)
    tiles_x = cam_ref[15].astype(jnp.int32)
    tx = pid % tiles_x
    ty = pid // tiles_x
    px, py = _pixel_xy(tx, ty)
    x = (px + 0.5 - cam_ref[12]) * cam_ref[14]
    y = (cam_ref[13] - py - 0.5) * cam_ref[14]
    dx = cam_ref[0] * x + cam_ref[3] * y + cam_ref[6]
    dy = cam_ref[1] * x + cam_ref[4] * y + cam_ref[7]
    dz = cam_ref[2] * x + cam_ref[5] * y + cam_ref[8]
    inv_len = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    d = (dx * inv_len, dy * inv_len, dz * inv_len)
    o = (cam_ref[9], cam_ref[10], cam_ref[11])
    idir = tuple(1.0 / (c + 1e-8) for c in d)
    rlo = (cam_ref[16], cam_ref[17], cam_ref[18])
    rhi = (cam_ref[19], cam_ref[20], cam_ref[21])
    t1 = tuple((rlo[k] - o[k]) * idir[k] for k in range(3))
    t2 = tuple((rhi[k] - o[k]) * idir[k] for k in range(3))
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t1[0], t2[0]), jnp.maximum(t1[1], t2[1])),
        jnp.maximum(t1[2], t2[2]),
    )
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t1[0], t2[0]), jnp.minimum(t1[1], t2[1])),
        jnp.minimum(t1[2], t2[2]),
    )
    t_exit = jnp.where((tn <= tf) & (tf > 0.0), tf * 1.0001, 0.0)
    mb = jnp.max(t_exit) * 1.0001 + 1e-30
    im, iM, om, oM = _bounds_of(o, d, idir)
    out_ref[0] = _leaf_pass(lf_ref, im, iM, om, oM, mb, k_bands,
                            n_leaf, out_ref.shape[2])


def _words_shared_kernel(orig_ref, dx_ref, dy_ref, dz_ref, tm_ref,
                         lf_ref, out_ref, *, k_bands: int, n_leaf: int):
    o = (orig_ref[0], orig_ref[1], orig_ref[2])
    d = (dx_ref[0], dy_ref[0], dz_ref[0])
    idir = tuple(1.0 / (c + 1e-8) for c in d)
    limit = jnp.where(tm_ref[0] >= 0.0, tm_ref[0], -BIG)
    mb = jnp.max(limit) * 1.0001 + 1e-30
    im, iM, om, oM = _bounds_of(o, d, idir)
    out_ref[0] = _leaf_pass(lf_ref, im, iM, om, oM, mb, k_bands,
                            n_leaf, out_ref.shape[2])


def _words_general_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
                          dz_ref, tm_ref, lf_ref, out_ref, *,
                          k_bands: int, n_leaf: int):
    o = (ox_ref[0], oy_ref[0], oz_ref[0])
    d = (dx_ref[0], dy_ref[0], dz_ref[0])
    idir = tuple(1.0 / (c + 1e-8) for c in d)
    limit = jnp.where(tm_ref[0] >= 0.0, jnp.minimum(tm_ref[0], BIG),
                      -BIG)
    mb = jnp.max(limit) * 1.0001 + 1e-30
    im, iM, om, oM = _bounds_of(o, d, idir)
    out_ref[0] = _leaf_pass(lf_ref, im, iM, om, oM, mb, k_bands,
                            n_leaf, out_ref.shape[2])


def _words_out(p, nv, k_bands):
    rows, rp = _wl_block_shape(nv, k_bands)
    return (pl.BlockSpec((1, rows, rp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            jax.ShapeDtypeStruct((p, rows, rp), jnp.int32))


@partial(jax.jit, static_argnames=("p", "k_bands", "n_leaf"))
def _run_words_camera(cam, lf_boxv, p, k_bands, n_leaf):
    spec, shape = _words_out(p, lf_boxv.shape[1], k_bands)
    return pl.pallas_call(
        partial(_words_camera_kernel, k_bands=k_bands, n_leaf=n_leaf),
        grid=(p,),
        in_specs=[_smem(), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=shape,
        interpret=_interpret(),
    )(cam, lf_boxv)


@partial(jax.jit, static_argnames=("k_bands", "n_leaf"))
def _run_words_shared(orig, dx, dy, dz, tm, lf_boxv, k_bands, n_leaf):
    p = dx.shape[0]
    spec, shape = _words_out(p, lf_boxv.shape[1], k_bands)
    return pl.pallas_call(
        partial(_words_shared_kernel, k_bands=k_bands, n_leaf=n_leaf),
        grid=(p,),
        in_specs=[_smem()] + [_blk()] * 4
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=shape,
        interpret=_interpret(),
    )(orig, dx, dy, dz, tm, lf_boxv)


@partial(jax.jit, static_argnames=("k_bands", "n_leaf"))
def _run_words_general(ox, oy, oz, dx, dy, dz, tm, lf_boxv, k_bands,
                       n_leaf):
    p = dx.shape[0]
    spec, shape = _words_out(p, lf_boxv.shape[1], k_bands)
    return pl.pallas_call(
        partial(_words_general_kernel, k_bands=k_bands, n_leaf=n_leaf),
        grid=(p,),
        in_specs=[_blk()] * 7 + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=shape,
        interpret=_interpret(),
    )(ox, oy, oz, dx, dy, dz, tm, lf_boxv)


def _widen(lo, hi):
    """Conservative widening of a reduced bound pair (guards f32
    reassociation between the dense pass and the per-ray kernels)."""
    w = 1e-6
    return (lo - jnp.abs(lo) * w - 1e-30, hi + jnp.abs(hi) * w + 1e-30)


def _bounds_of(o, d, idir):
    """In-kernel per-packet interval bounds from (8,128)-style vectors
    (or scalars for shared origins)."""
    im, iM, om, oM = [], [], [], []
    for k in range(3):
        lo, hi = _widen(jnp.min(idir[k]), jnp.max(idir[k]))
        im.append(lo)
        iM.append(hi)
        if getattr(o[k], "ndim", 0) == 0 or o[k].ndim == 0:
            om.append(o[k])
            oM.append(o[k])
        else:
            lo, hi = _widen(jnp.min(o[k]), jnp.max(o[k]))
            om.append(lo)
            oM.append(hi)
    return tuple(im), tuple(iM), tuple(om), tuple(oM)


def _traverse_wl(lfc_ref, wl_ref, o, idir, maxb0_bits, lim_fn,
                 process_fn,
                 tris_hbm, tscratch, sems, lq_ref, bits_ref, qlist_ref,
                 stats_ref, browt, lbt_ref=None, *, k_bands: int,
                 nv: int):
    """Drain-only traversal: scan the per-band leaf bit words (the fused
    leaf pass already did every interval test) and feed the leaf DMA
    ring + chunk drain. No stack, no node meta, no per-pop SMEM chains —
    the scalar core's serial work is one summary-word hop per populated
    word plus ~10 ops per discovered leaf.

    Bands run inside ONE while loop (state machine) so the large drain
    body is instantiated exactly once (a static per-band unroll measured
    ~3x slower — i-cache), and the leaf queue CARRIES over band
    boundaries, draining only when the ring is full. Scan state
    (b, s, sw, wid, word): pop a leaf bit, else hop to the next
    populated word of summary s, else the next summary word, else enter
    the next band (applying the band-floor skip with the bound of the
    last drain — stale is conservative). ``stats_ref`` counters keep
    their _traverse_ival meaning ([0] counts word hops)."""
    chunk_drain = _make_chunk_drain(
        o, idir, lim_fn, process_fn, tris_hbm, tscratch, sems,
        lq_ref, bits_ref, qlist_ref, stats_ref, browt=browt,
        lbt_ref=lbt_ref, bound_bits=True)

    # garbage ids in never-written queue slots would be OOB SMEM reads
    # in the staged-box-table culls (the round-4 fault mode) — zero once
    @pl.when(pl.program_id(0) == 0)
    def _():
        for i in range(NBUF):
            lq_ref[i * 3 + 2] = 0

    if stats_ref is not None:
        for i in range(8):
            stats_ref[0, 0, i] = 0

    def _enq(nq, first, count, t):
        if _PROF != "nodma":
            _leaf_dma(tris_hbm, tscratch, sems, nq, first).start()
            if browt is not None:
                _boxrow_dma(browt[0], browt[1], browt[2], nq, t).start()
        lq_ref[nq * 3] = first
        lq_ref[nq * 3 + 1] = count
        lq_ref[nq * 3 + 2] = t
        if stats_ref is not None:
            stats_ref[0, 0, 1] = stats_ref[0, 0, 1] + 1

    def read_word(b, wid):
        # wid = blk<<5 | g<<3 | sb
        return wl_ref[b * 5 + (jax.lax.shift_right_logical(wid, 3) & 3),
                      jax.lax.shift_right_logical(wid, 5) * 8
                      + (wid & 7)]

    def read_sum(b, s):
        return wl_ref[b * 5 + 4, s]

    def read_blo(b):
        # raw f32 bits; compared against the bits-encoded bound (both
        # non-negative floats, so integer order == float order)
        return wl_ref[k_bands * 5, b]

    def scan_body(c):
        b, s, sw, wid, word, nq, mb = c

        def pop(c):
            b, s, sw, wid, word, nq, mb = c
            low = word & (-word)
            p = 31 - jax.lax.clz(low)
            # leaf = blk*1024 + sb*128 + g*32 + p
            t = (jnp.left_shift(jax.lax.shift_right_logical(wid, 5), 10)
                 | jnp.left_shift(wid & 7, 7)
                 | jnp.left_shift(jax.lax.shift_right_logical(wid, 3)
                                  & 3, 5)
                 | p)
            fc = lfc_ref[t]
            _enq(nq, jax.lax.shift_right_logical(fc, 7), fc & 0x7F, t)
            return b, s, sw, wid, word & (word - 1), nq + 1, mb

        def advance(c):
            b, s, sw, wid, word, nq, mb = c
            if stats_ref is not None:
                stats_ref[0, 0, 0] = stats_ref[0, 0, 0] + 1

            def from_sw(c):
                b, s, sw, wid, word, nq, mb = c
                low = sw & (-sw)
                j = 31 - jax.lax.clz(low)  # j = g*8 + sb of block s
                wid = (jnp.left_shift(s, 5)
                       | jnp.left_shift(jax.lax.shift_right_logical(j, 3)
                                        & 3, 3)
                       | (j & 7))
                return (b, s, sw & (sw - 1), wid, read_word(b, wid),
                        nq, mb)

            def from_s(c):
                b, s, sw, wid, word, nq, mb = c
                s = s + 1
                return b, s, read_sum(b, s), wid, word, nq, mb

            def next_band(c):
                b, s, sw, wid, word, nq, mb = c
                b = b + 1
                bc = jnp.minimum(b, k_bands - 1)
                # every leaf in band b has tn >= blo[b] (bands are
                # assigned by comparing against these exact values;
                # empty bands carry blo = BIG): skip once the packet
                # bound is at or below the floor
                skip = (b >= k_bands) | (read_blo(bc) >= mb)
                s = jnp.where(skip, nv - 1, 0)
                sw = jnp.where(skip, 0, read_sum(bc, 0))
                return b, s, sw, wid, word, nq, mb

            return jax.lax.cond(
                sw != 0, from_sw,
                lambda c: jax.lax.cond(c[1] + 1 < nv, from_s,
                                       next_band, c),
                c)

        return jax.lax.cond(word != 0, pop, advance, c)

    def outer(carry):
        b, s, sw, wid, word, mb = carry
        b, s, sw, wid, word, nq, _ = jax.lax.while_loop(
            lambda c: (c[5] < NBUF) & (c[0] < k_bands),
            scan_body, (b, s, sw, wid, word, 0, mb))
        return b, s, sw, wid, word, chunk_drain(nq, mb)

    jax.lax.while_loop(
        lambda c: (c[0] < k_bands) & (c[5] > 0),
        outer,
        (jnp.int32(-1), jnp.int32(nv - 1), jnp.int32(0), jnp.int32(0),
         jnp.int32(0), maxb0_bits))


def _stage_lfc(lfc_hbm, lfc_s, ssem, boxrows_hbm=None, lbt_s=None):
    @pl.when(pl.program_id(0) == 0)
    def _():
        cp = pltpu.make_async_copy(lfc_hbm, lfc_s, ssem.at[0])
        cp.start()
        if lbt_s is not None:
            cb = pltpu.make_async_copy(boxrows_hbm, lbt_s, ssem.at[1])
            cb.start()
            cb.wait()
        cp.wait()


def _camera_wl_body(lfc_hbm, cam_ref, boxrows_hbm, tris_hbm, wlw_hbm,
                    dist_ref, u_ref, v_ref, tri_out,
                    dx_ref, dy_ref, dz_ref, st_ref,
                    best_ref, bu_ref, bv_ref, tri_ref,
                    tscratch, lq_ref, bits_ref, qlist_ref,
                    lfc_s, wl_s, lbrow_s, sems, bsems, ssem,
                    *, k_bands: int, nv: int, raw: bool = False):
    """Primary rays: camera-fused raygen + drain-only traversal over the
    words kernel's block. cam layout extends _camera_kernel's f32[16]
    with root lo.xyz (16:19) / hi.xyz (19:22). ``raw``: tris_hbm holds
    raw triangle rows instead of the per-frame shared_rows table."""
    if _wl_stage_boxes(boxrows_hbm):
        _stage_lfc(lfc_hbm, lfc_s, ssem, boxrows_hbm, lbrow_s)
        browt, lbt = None, lbrow_s
    else:
        _stage_lfc(lfc_hbm, lfc_s, ssem)
        browt, lbt = (boxrows_hbm, lbrow_s, bsems), None
    _load_wl(wlw_hbm, wl_s, ssem)
    pid = pl.program_id(0)
    tiles_x = cam_ref[15].astype(jnp.int32)
    tx = pid % tiles_x
    ty = pid // tiles_x

    px, py = _pixel_xy(tx, ty)
    x = (px + 0.5 - cam_ref[12]) * cam_ref[14]
    y = (cam_ref[13] - py - 0.5) * cam_ref[14]

    dx = cam_ref[0] * x + cam_ref[3] * y + cam_ref[6]
    dy = cam_ref[1] * x + cam_ref[4] * y + cam_ref[7]
    dz = cam_ref[2] * x + cam_ref[5] * y + cam_ref[8]
    inv_len = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    dx = dx * inv_len
    dy = dy * inv_len
    dz = dz * inv_len

    o = (cam_ref[9], cam_ref[10], cam_ref[11])
    d = (dx, dy, dz)
    idir = tuple(1.0 / (c + 1e-8) for c in d)

    rlo = (cam_ref[16], cam_ref[17], cam_ref[18])
    rhi = (cam_ref[19], cam_ref[20], cam_ref[21])
    t1 = tuple((rlo[k] - o[k]) * idir[k] for k in range(3))
    t2 = tuple((rhi[k] - o[k]) * idir[k] for k in range(3))
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t1[0], t2[0]), jnp.maximum(t1[1], t2[1])),
        jnp.maximum(t1[2], t2[2]),
    )
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t1[0], t2[0]), jnp.minimum(t1[1], t2[1])),
        jnp.minimum(t1[2], t2[2]),
    )
    t_exit = jnp.where((tn <= tf) & (tf > 0.0), tf * 1.0001, 0.0)
    mb_bits = jnp.max(pltpu.bitcast(jnp.maximum(t_exit, 0.0), jnp.int32))

    best_ref[:, :] = t_exit
    bu_ref[:, :] = jnp.zeros((RAY_SUB, RAY_LANE), jnp.float32)
    bv_ref[:, :] = jnp.zeros((RAY_SUB, RAY_LANE), jnp.float32)
    tri_ref[:, :] = jnp.full((RAY_SUB, RAY_LANE), -1, jnp.int32)

    dx_ref[0] = dx
    dy_ref[0] = dy
    dz_ref[0] = dz
    d_refs = (dx_ref.at[0], dy_ref.at[0], dz_ref.at[0])

    if raw:
        lim_fn, process_fn = _closest_ival_drain_sh_raw(
            o, d_refs, tscratch, best_ref, bu_ref, bv_ref, tri_ref)
    else:
        lim_fn, process_fn = _closest_ival_drain(
            d_refs, tscratch, best_ref, bu_ref, bv_ref, tri_ref)
    _traverse_wl(lfc_s, wl_s, o, idir, mb_bits, lim_fn, process_fn,
                 tris_hbm, tscratch, sems, lq_ref, bits_ref, qlist_ref,
                 st_ref, browt, lbt,
                 k_bands=k_bands, nv=nv)

    dist_ref[0] = jnp.where(tri_ref[:, :] >= 0, best_ref[:, :], BIG)
    u_ref[0] = bu_ref[:, :]
    v_ref[0] = bv_ref[:, :]
    tri_out[0] = tri_ref[:, :]


def _camera_wl_kernel(lfc_hbm, cam_ref, boxrows_hbm, tris_hbm, wlw_hbm,
                      dist_ref, u_ref, v_ref, tri_out,
                      dx_ref, dy_ref, dz_ref, *rest, k_bands, nv,
                      raw=False):
    _camera_wl_body(lfc_hbm, cam_ref, boxrows_hbm, tris_hbm, wlw_hbm,
                    dist_ref, u_ref, v_ref, tri_out,
                    dx_ref, dy_ref, dz_ref, None, *rest,
                    k_bands=k_bands, nv=nv, raw=raw)


def _camera_wl_kernel_stats(lfc_hbm, cam_ref, boxrows_hbm, tris_hbm,
                            wlw_hbm, dist_ref, u_ref, v_ref, tri_out,
                            dx_ref, dy_ref, dz_ref, st_ref, *rest,
                            k_bands, nv):
    _camera_wl_body(lfc_hbm, cam_ref, boxrows_hbm, tris_hbm, wlw_hbm,
                    dist_ref, u_ref, v_ref, tri_out,
                    dx_ref, dy_ref, dz_ref, st_ref, *rest,
                    k_bands=k_bands, nv=nv)


def _shadow_wl_body(lfc_hbm, orig_ref, boxrows_hbm,
                    dx_ref, dy_ref, dz_ref, tm_ref, tris_hbm, wlw_hbm,
                    out_ref, st_ref, blocked_ref,
                    tscratch, lq_ref, bits_ref, qlist_ref,
                    lfc_s, wl_s, lbrow_s, sems, bsems, ssem,
                    *, k_bands: int, nv: int, raw: bool = False):
    """Shadow any-hit from the shared light origin, worklist."""
    if _wl_stage_boxes(boxrows_hbm):
        _stage_lfc(lfc_hbm, lfc_s, ssem, boxrows_hbm, lbrow_s)
        browt, lbt = None, lbrow_s
    else:
        _stage_lfc(lfc_hbm, lfc_s, ssem)
        browt, lbt = (boxrows_hbm, lbrow_s, bsems), None
    _load_wl(wlw_hbm, wl_s, ssem)
    o = (orig_ref[0], orig_ref[1], orig_ref[2])
    d = (dx_ref[0], dy_ref[0], dz_ref[0])
    tmax = tm_ref[0]
    idir = tuple(1.0 / (c + 1e-8) for c in d)

    active = tmax >= 0.0
    blocked_ref[:, :] = jnp.zeros(tmax.shape, jnp.float32)
    limit = jnp.where(active, tmax, -BIG)
    mb_bits = jnp.max(pltpu.bitcast(jnp.maximum(limit, 0.0), jnp.int32))

    d_refs = (dx_ref.at[0], dy_ref.at[0], dz_ref.at[0])
    if raw:
        lim_fn, process_fn = _shadow_ival_drain_sh_raw(
            o, d_refs, tm_ref, limit, tscratch, blocked_ref)
    else:
        lim_fn, process_fn = _shadow_ival_drain(d_refs, tm_ref, limit,
                                                tscratch, blocked_ref)
    _traverse_wl(lfc_s, wl_s, o, idir, mb_bits, lim_fn, process_fn,
                 tris_hbm, tscratch, sems, lq_ref, bits_ref, qlist_ref,
                 st_ref, browt, lbt,
                 k_bands=k_bands, nv=nv)
    out_ref[0] = blocked_ref[:, :]


def _shadow_wl_kernel(lfc_hbm, orig_ref, boxrows_hbm,
                      dx_ref, dy_ref, dz_ref, tm_ref, tris_hbm, wlw_hbm,
                      out_ref, *rest, k_bands, nv, raw=False):
    _shadow_wl_body(lfc_hbm, orig_ref, boxrows_hbm,
                    dx_ref, dy_ref, dz_ref, tm_ref, tris_hbm, wlw_hbm,
                    out_ref, None, *rest, k_bands=k_bands, nv=nv,
                    raw=raw)


def _shadow_wl_kernel_stats(lfc_hbm, orig_ref, boxrows_hbm,
                            dx_ref, dy_ref, dz_ref, tm_ref, tris_hbm,
                            wlw_hbm, out_ref, st_ref, *rest, k_bands,
                            nv):
    _shadow_wl_body(lfc_hbm, orig_ref, boxrows_hbm,
                    dx_ref, dy_ref, dz_ref, tm_ref, tris_hbm, wlw_hbm,
                    out_ref, st_ref, *rest, k_bands=k_bands, nv=nv)


def _closest_wl_kernel_g(lfc_hbm, boxrows_hbm,
                         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                         tm_ref, tris_hbm, wlw_hbm,
                         dist_ref, u_ref, v_ref, tri_out,
                         best_ref, bu_ref, bv_ref, tri_ref,
                         tscratch, lq_ref, bits_ref, qlist_ref,
                         lfc_s, wl_s, lbrow_s, sems, bsems, ssem,
                         *, k_bands: int, nv: int):
    """General per-ray-origin closest hit (bounce rays), worklist."""
    if _wl_stage_boxes(boxrows_hbm):
        _stage_lfc(lfc_hbm, lfc_s, ssem, boxrows_hbm, lbrow_s)
        browt, lbt = None, lbrow_s
    else:
        _stage_lfc(lfc_hbm, lfc_s, ssem)
        browt, lbt = (boxrows_hbm, lbrow_s, bsems), None
    _load_wl(wlw_hbm, wl_s, ssem)
    o = (ox_ref[0], oy_ref[0], oz_ref[0])
    d = (dx_ref[0], dy_ref[0], dz_ref[0])
    tmax = tm_ref[0]
    idir = tuple(1.0 / (c + 1e-8) for c in d)

    active = tmax >= 0.0
    best_ref[:, :] = jnp.where(active, jnp.minimum(tmax, BIG), -BIG)
    bu_ref[:, :] = jnp.zeros_like(tmax)
    bv_ref[:, :] = jnp.zeros_like(tmax)
    tri_ref[:, :] = jnp.full(tmax.shape, -1, jnp.int32)
    mb_bits = jnp.max(pltpu.bitcast(
        jnp.maximum(best_ref[:, :], 0.0), jnp.int32))

    o_refs = (ox_ref.at[0], oy_ref.at[0], oz_ref.at[0])
    d_refs = (dx_ref.at[0], dy_ref.at[0], dz_ref.at[0])
    lim_fn, process_fn = _closest_ival_drain_g(
        o_refs, d_refs, tscratch, best_ref, bu_ref, bv_ref, tri_ref)
    _traverse_wl(lfc_s, wl_s, o, idir, mb_bits, lim_fn, process_fn,
                 tris_hbm, tscratch, sems, lq_ref, bits_ref, qlist_ref,
                 None, browt, lbt,
                 k_bands=k_bands, nv=nv)

    hit = tri_ref[:, :] >= 0
    dist_ref[0] = jnp.where(hit, best_ref[:, :],
                            jnp.where(active, BIG, -BIG))
    u_ref[0] = bu_ref[:, :]
    v_ref[0] = bv_ref[:, :]
    tri_out[0] = jnp.maximum(tri_ref[:, :], 0)


def _shadow_wl_kernel_g(lfc_hbm, boxrows_hbm,
                        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                        tm_ref, tris_hbm, wlw_hbm,
                        out_ref, blocked_ref,
                        tscratch, lq_ref, bits_ref, qlist_ref,
                        lfc_s, wl_s, lbrow_s, sems, bsems, ssem,
                        *, k_bands: int, nv: int):
    """General per-ray-origin any-hit, worklist."""
    if _wl_stage_boxes(boxrows_hbm):
        _stage_lfc(lfc_hbm, lfc_s, ssem, boxrows_hbm, lbrow_s)
        browt, lbt = None, lbrow_s
    else:
        _stage_lfc(lfc_hbm, lfc_s, ssem)
        browt, lbt = (boxrows_hbm, lbrow_s, bsems), None
    _load_wl(wlw_hbm, wl_s, ssem)
    o = (ox_ref[0], oy_ref[0], oz_ref[0])
    d = (dx_ref[0], dy_ref[0], dz_ref[0])
    tmax = tm_ref[0]
    idir = tuple(1.0 / (c + 1e-8) for c in d)

    active = tmax >= 0.0
    blocked_ref[:, :] = jnp.zeros(tmax.shape, jnp.float32)
    limit = jnp.where(active, tmax, -BIG)
    mb_bits = jnp.max(pltpu.bitcast(jnp.maximum(limit, 0.0), jnp.int32))

    o_refs = (ox_ref.at[0], oy_ref.at[0], oz_ref.at[0])
    d_refs = (dx_ref.at[0], dy_ref.at[0], dz_ref.at[0])
    lim_fn, process_fn = _shadow_ival_drain_g(
        o_refs, d_refs, tm_ref, limit, tscratch, blocked_ref)
    _traverse_wl(lfc_s, wl_s, o, idir, mb_bits, lim_fn, process_fn,
                 tris_hbm, tscratch, sems, lq_ref, bits_ref, qlist_ref,
                 None, browt, lbt,
                 k_bands=k_bands, nv=nv)
    out_ref[0] = blocked_ref[:, :]


WL_BOX_SMEM_CAP = 384 * 1024  # stage the box-row table when it fits


def _wl_stage_boxes(boxrows) -> bool:
    return boxrows.shape[0] * 512 <= WL_BOX_SMEM_CAP


def _wl_scratches(lfc, wlw, boxrows):
    return [
        pltpu.VMEM((NBUF, IVAL_LEAF, TRI_ROW), jnp.float32),  # leaf ring
        pltpu.SMEM((NBUF * 3,), jnp.int32),  # leaf queue
        pltpu.SMEM((_BITS_WORDS,), jnp.int32),  # (leaf, quarter) bits
        pltpu.SMEM((NBUF * NQ,), jnp.int32),  # compacted survivors
        pltpu.SMEM((lfc.size,), jnp.int32),  # staged first<<7|count
        pltpu.SMEM((wlw.shape[1], wlw.shape[2]), jnp.int32),  # word block
        # leaf box rows: the WHOLE staged table when it fits, else
        # NBUF per-enqueue DMA slots
        pltpu.SMEM(((boxrows.shape[0], 128)
                    if _wl_stage_boxes(boxrows) else (NBUF, 128)),
                   jnp.float32),
        pltpu.SemaphoreType.DMA((NBUF,)),  # triangle ring
        pltpu.SemaphoreType.DMA((NBUF,)),  # box rows
        pltpu.SemaphoreType.DMA((4,)),  # lfc stage + word-block DMA
    ]


def _hbm():
    return pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)


def _cam_vec_rb(camera, width, height, tiles_x, root_lo, root_hi):
    """_cam_vec extended with the scene root box (worklist kernels have
    no SMEM node table to read it from)."""
    return jnp.concatenate([
        _cam_vec(camera, width, height, tiles_x),
        jnp.asarray(root_lo, jnp.float32),
        jnp.asarray(root_hi, jnp.float32),
    ])


@partial(jax.jit, static_argnames=("p", "k_bands", "nv", "raw"))
def _run_camera_wl(lfc, cam, tris, boxrows, wlw, p, k_bands, nv,
                   raw=False):
    return pl.pallas_call(
        partial(_camera_wl_kernel, k_bands=k_bands, nv=nv, raw=raw),
        grid=(p,),
        in_specs=[_hbm(), _smem(), _hbm(), _hbm(), _hbm()],
        out_specs=[_blk()] * 7,
        out_shape=(
            [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.int32)]
            + [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32)] * 3
        ),
        scratch_shapes=(
            [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32)] * 3
            + [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.int32)]
            + _wl_scratches(lfc, wlw, boxrows)
        ),
        interpret=_interpret(),
    )(lfc, cam, boxrows, tris, wlw)


@partial(jax.jit, static_argnames=("p", "k_bands", "nv"))
def _run_camera_wl_stats(lfc, cam, tris, boxrows, wlw, p, k_bands, nv):
    return pl.pallas_call(
        partial(_camera_wl_kernel_stats, k_bands=k_bands, nv=nv),
        grid=(p,),
        in_specs=[_hbm(), _smem(), _hbm(), _hbm(), _hbm()],
        out_specs=[_blk()] * 7 + [_stats_spec()],
        out_shape=(
            [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.int32)]
            + [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((p, 1, 8), jnp.int32)]
        ),
        scratch_shapes=(
            [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32)] * 3
            + [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.int32)]
            + _wl_scratches(lfc, wlw, boxrows)
        ),
        interpret=_interpret(),
    )(lfc, cam, boxrows, tris, wlw)


@partial(jax.jit, static_argnames=("k_bands", "nv", "raw"))
def _run_shadow_wl(lfc, orig, dx, dy, dz, tm, tris, boxrows, wlw,
                   k_bands, nv, raw=False):
    p = dx.shape[0]
    return pl.pallas_call(
        partial(_shadow_wl_kernel, k_bands=k_bands, nv=nv, raw=raw),
        grid=(p,),
        in_specs=[_hbm(), _smem(), _hbm()] + [_blk()] * 4
        + [_hbm(), _hbm()],
        out_specs=_blk(),
        out_shape=jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32)]  # blocked
            + _wl_scratches(lfc, wlw, boxrows)
        ),
        interpret=_interpret(),
    )(lfc, orig, boxrows, dx, dy, dz, tm, tris, wlw)


@partial(jax.jit, static_argnames=("k_bands", "nv"))
def _run_shadow_wl_stats(lfc, orig, dx, dy, dz, tm, tris, boxrows,
                         wlw, k_bands, nv):
    p = dx.shape[0]
    return pl.pallas_call(
        partial(_shadow_wl_kernel_stats, k_bands=k_bands, nv=nv),
        grid=(p,),
        in_specs=[_hbm(), _smem(), _hbm()] + [_blk()] * 4
        + [_hbm(), _hbm()],
        out_specs=[_blk(), _stats_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32),
            jax.ShapeDtypeStruct((p, 1, 8), jnp.int32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32)]  # blocked
            + _wl_scratches(lfc, wlw, boxrows)
        ),
        interpret=_interpret(),
    )(lfc, orig, boxrows, dx, dy, dz, tm, tris, wlw)


@partial(jax.jit, static_argnames=("k_bands", "nv"))
def _run_closest_wl_g(lfc, ox, oy, oz, dx, dy, dz, tm, tris, boxrows,
                      wlw, k_bands, nv):
    p = ox.shape[0]
    return pl.pallas_call(
        partial(_closest_wl_kernel_g, k_bands=k_bands, nv=nv),
        grid=(p,),
        in_specs=[_hbm(), _hbm()] + [_blk()] * 7
        + [_hbm(), _hbm()],
        out_specs=[_blk()] * 4,
        out_shape=(
            [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.int32)]
        ),
        scratch_shapes=(
            [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32)] * 3
            + [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.int32)]
            + _wl_scratches(lfc, wlw, boxrows)
        ),
        interpret=_interpret(),
    )(lfc, boxrows, ox, oy, oz, dx, dy, dz, tm, tris, wlw)


@partial(jax.jit, static_argnames=("k_bands", "nv"))
def _run_shadow_wl_g(lfc, ox, oy, oz, dx, dy, dz, tm, tris, boxrows,
                     wlw, k_bands, nv):
    p = ox.shape[0]
    return pl.pallas_call(
        partial(_shadow_wl_kernel_g, k_bands=k_bands, nv=nv),
        grid=(p,),
        in_specs=[_hbm(), _hbm()] + [_blk()] * 7
        + [_hbm(), _hbm()],
        out_specs=_blk(),
        out_shape=jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32)]  # blocked
            + _wl_scratches(lfc, wlw, boxrows)
        ),
        interpret=_interpret(),
    )(lfc, boxrows, ox, oy, oz, dx, dy, dz, tm, tris, wlw)


def _wl_available(scene) -> bool:
    return (_WL and getattr(scene, "wl_boxrows", None) is not None
            and scene.leaf_max <= IVAL_LEAF)


def _wl_raw_tris(scene) -> bool:
    """Trace raw triangle rows (skip the shared_rows per-frame table)
    when the table would double a multi-GB HBM array."""
    return scene.pk_tris.size * 4 > (1 << 31)


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------


def _pk(x):
    """(R,) flat, R % PACKET_R == 0 -> (P, 8, 128)."""
    return x.reshape(-1, RAY_SUB, RAY_LANE)


def _blk():
    return pl.BlockSpec((1, RAY_SUB, RAY_LANE), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _smem():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _scratches():
    return [
        pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32),  # best
        pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32),  # bu
        pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32),  # bv
        pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.int32),  # tri
        pltpu.VMEM((LEAF_PAD, TRI_ROW), jnp.float32),  # staged leaf
        pltpu.SMEM((STACK_CAP,), jnp.int32),  # stack
        pltpu.SemaphoreType.DMA(()),
    ]


def _signs_of(dx0, dy0, dz0):
    """Per-packet near/far ordering bits from ray 0 of each packet
    (reference traverse.cpp:21), flat (P*4,) i32 for dense SMEM."""
    signs = jnp.stack(
        [dx0 < 0, dy0 < 0, dz0 < 0, jnp.zeros_like(dx0, bool)], axis=1
    )
    return signs.astype(jnp.int32).reshape(-1)


@partial(jax.jit, static_argnames=("p",))
def _run_camera(meta, box, cam, signs, tris, p):
    outs = pl.pallas_call(
        _camera_kernel,
        grid=(p,),
        in_specs=[_smem(), _smem(), _smem(), _smem(),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[_blk()] * 7,
        out_shape=(
            [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.int32)]
            + [jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32)] * 3
        ),
        scratch_shapes=_scratches(),
        interpret=_interpret(),
    )(meta, box, cam, signs, tris)
    return outs


def _cam_vec(camera, width, height, tiles_x):
    """SMEM camera scalar vector (layout documented on _camera_kernel)."""
    return jnp.concatenate([
        camera.right,
        camera.up,
        camera.front * camera.plane_dist,
        camera.pos,
        jnp.stack([
            jnp.float32(width * 0.5),
            jnp.float32(height * 0.5),
            jnp.float32(1.0 / height),
            jnp.float32(tiles_x),
        ]),
    ]).astype(jnp.float32)


def _dummy_masks(p):
    return jnp.zeros((p, 8, 128), jnp.int32)


def camera_trace(scene, camera, width: int, height: int):
    """Fused raygen + closest hit for a full frame of primary rays.

    Returns flat (R,) arrays: dist, u, v, tri, dx, dy, dz in kernel
    packet order: TILE x TILE pixel tiles whose within-tile layout is
    SQUARE-QUADRANT (ray k of a packet is quadrant k>>10, raster inside
    it — see _pixel_xy; kernel_ray_index is the canonical
    packet-order-to-pixel mapping). Requires width and height to be
    multiples of TILE.

    Routing: worklist kernels when the leaf tables exist; else the
    interval-walk kernels (flat or paged); fat-leaf flat scenes fall
    back to the vector-culled kernel."""
    assert width % TILE == 0 and height % TILE == 0, (width, height)
    tiles_x = width // TILE
    p = tiles_x * (height // TILE)
    cam = _cam_vec(camera, width, height, tiles_x)

    if _wl_available(scene):
        # fused drain-only worklist: the in-kernel leaf pass replaces
        # both the node-mask pass and the walk; leaf boxes by
        # enqueue-time row DMA, so the same kernel serves any scene size
        cam_rb = _cam_vec_rb(camera, width, height, tiles_x,
                             scene.node_lo[0], scene.node_hi[0])
        wlw = _run_words_camera(cam_rb, scene.lf_boxv, p, WL_BANDS,
                                scene.wl_nl)
        # huge scenes trace raw triangle rows: the per-frame
        # shared-origin precompute table doubles a multi-GB array
        raw = _wl_raw_tris(scene)
        dist, u, v, tri, dx, dy, dz = _run_camera_wl(
            scene.wl_lfc, cam_rb,
            scene.pk_tris if raw else shared_rows(scene.pk_tris,
                                                  camera.pos),
            scene.wl_boxrows, wlw, p, WL_BANDS, scene.lf_boxv.shape[1],
            raw)
        f = lambda a: a.reshape(-1)
        return f(dist), f(u), f(v), f(tri), f(dx), f(dy), f(dz)

    if _NMASK:
        masks = _camera_mask_words(scene.mk_boxv, camera, width, height,
                                   scene.node_lo[0], scene.node_hi[0])
    else:
        masks = _dummy_masks(p)

    if getattr(scene, "pg_meta", None) is not None:
        # two-level large-scene walk (bvh/pages.py)
        dist, u, v, tri, dx, dy, dz = _run_camera_ival_paged(
            scene.pk_meta, scene.pk_box, cam,
            shared_rows(scene.pk_tris, camera.pos),
            scene.pg_meta, scene.pg_box, masks, p,
            scene.mk_off, scene.mk_cap,
        )
        f = lambda a: a.reshape(-1)
        return f(dist), f(u), f(v), f(tri), f(dx), f(dy), f(dz)

    if scene.leaf_max <= IVAL_LEAF:
        dist, u, v, tri, dx, dy, dz = _run_camera_ival(
            scene.pk_meta, scene.pk_box, cam,
            shared_rows(scene.pk_tris, camera.pos), masks, p
        )
        f = lambda a: a.reshape(-1)
        return f(dist), f(u), f(v), f(tri), f(dx), f(dy), f(dz)

    # ray 0 of packet (tx, ty) is pixel (tx*32, ty*32)
    txs = jnp.arange(p, dtype=jnp.int32) % tiles_x
    tys = jnp.arange(p, dtype=jnp.int32) // tiles_x
    x0 = (txs.astype(jnp.float32) * TILE + 0.5 - width * 0.5) / height
    y0 = (height * 0.5 - tys.astype(jnp.float32) * TILE - 0.5) / height
    d0 = (
        camera.right[None] * x0[:, None]
        + camera.up[None] * y0[:, None]
        + (camera.front * camera.plane_dist)[None]
    )
    signs = _signs_of(d0[:, 0], d0[:, 1], d0[:, 2])

    dist, u, v, tri, dx, dy, dz = _run_camera(
        scene.pk_meta, scene.pk_box, cam, signs, scene.pk_tris, p
    )
    f = lambda a: a.reshape(-1)
    return f(dist), f(u), f(v), f(tri), f(dx), f(dy), f(dz)


def camera_trace_stats(scene, camera, width: int, height: int):
    """Counter-instrumented :func:`camera_trace` (interval path only).

    Returns (dist, u, v, tri, dx, dy, dz, stats) where stats is (P, 8)
    int32 per-packet counters: [nodes, leaves_enqueued, leaves_processed,
    tris_tested, chunks, 0, 0, 0] — real in-kernel measurements, the
    TreeStats rebuild (reference src/tree_stats.h:36-130)."""
    assert width % TILE == 0 and height % TILE == 0, (width, height)
    assert scene.leaf_max <= IVAL_LEAF, "stats path needs interval kernels"
    tiles_x = width // TILE
    p = tiles_x * (height // TILE)
    cam = _cam_vec(camera, width, height, tiles_x)
    if _wl_available(scene):
        cam_rb = _cam_vec_rb(camera, width, height, tiles_x,
                             scene.node_lo[0], scene.node_hi[0])
        wlw = _run_words_camera(cam_rb, scene.lf_boxv, p, WL_BANDS,
                                scene.wl_nl)
        out = _run_camera_wl_stats(
            scene.wl_lfc, cam_rb, shared_rows(scene.pk_tris, camera.pos),
            scene.wl_boxrows, wlw, p, WL_BANDS, scene.lf_boxv.shape[1])
    else:
        masks = (_camera_mask_words(scene.mk_boxv, camera, width, height,
                                    scene.node_lo[0], scene.node_hi[0])
                 if _NMASK else _dummy_masks(p))
        out = _run_camera_ival_stats(
            scene.pk_meta, scene.pk_box, cam,
            shared_rows(scene.pk_tris, camera.pos), masks, p
        )
    dist, u, v, tri, dx, dy, dz, stats = out
    f = lambda a: a.reshape(-1)
    return (f(dist), f(u), f(v), f(tri), f(dx), f(dy), f(dz),
            stats.reshape(p, 8))


def any_hit_shared_stats(scene, light_pos, d3, tmax):
    """Counter-instrumented :func:`any_hit_shared` (interval path only).

    Returns (blocked bool (R,), stats (P, 8) int32)."""
    assert scene.leaf_max <= IVAL_LEAF
    dx, n = _pad_flat(d3[0], 1.0)
    dy, _ = _pad_flat(d3[1], 1.0)
    dz, _ = _pad_flat(d3[2], 1.0)
    tm, _ = _pad_flat(tmax, -BIG)
    orig = jnp.pad(jnp.asarray(light_pos, jnp.float32), (0, 1))
    pk = _pk
    if _wl_available(scene):
        wlw = _run_words_shared(orig, pk(dx), pk(dy), pk(dz), pk(tm),
                                scene.lf_boxv, 1, scene.wl_nl)
        out, stats = _run_shadow_wl_stats(
            scene.wl_lfc, orig, pk(dx), pk(dy), pk(dz), pk(tm),
            shared_rows(scene.pk_tris,
                        jnp.asarray(light_pos, jnp.float32)),
            scene.wl_boxrows, wlw, 1, scene.lf_boxv.shape[1],
        )
        return out.reshape(-1)[:n] > 0.0, stats.reshape(-1, 8)
    masks = (_shared_mask_words(scene.mk_boxv, orig, pk(dx), pk(dy),
                                pk(dz), pk(tm))
             if _NMASK else _dummy_masks(pk(dx).shape[0]))
    out, stats = _run_shadow_ival_stats(
        scene.pk_meta, scene.pk_box, orig,
        pk(dx), pk(dy), pk(dz), pk(tm),
        shared_rows(scene.pk_tris, jnp.asarray(light_pos, jnp.float32)),
        masks,
    )
    return out.reshape(-1)[:n] > 0.0, stats.reshape(-1, 8)


@jax.jit
def _run_closest(meta, box, signs, ox, oy, oz, dx, dy, dz, tm, tris):
    p = ox.shape[0]
    return pl.pallas_call(
        _closest_kernel,
        grid=(p,),
        in_specs=[_smem(), _smem(), _smem()] + [_blk()] * 7
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[_blk()] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32),
            jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32),
            jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32),
            jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.int32),
        ],
        scratch_shapes=_scratches(),
        interpret=_interpret(),
    )(meta, box, signs, ox, oy, oz, dx, dy, dz, tm, tris)


@jax.jit
def _run_shadow(meta, box, orig, signs, dx, dy, dz, tm, tris):
    p = dx.shape[0]
    return pl.pallas_call(
        _shadow_kernel,
        grid=(p,),
        in_specs=[_smem(), _smem(), _smem(), _smem()] + [_blk()] * 4
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=_blk(),
        out_shape=jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32),  # blocked
            pltpu.VMEM((LEAF_PAD, TRI_ROW), jnp.float32),
            pltpu.SMEM((STACK_CAP,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(meta, box, orig, signs, dx, dy, dz, tm, tris)


@jax.jit
def _run_shadow_g(meta, box, signs, ox, oy, oz, dx, dy, dz, tm, tris):
    p = dx.shape[0]
    return pl.pallas_call(
        _shadow_kernel_g,
        grid=(p,),
        in_specs=[_smem(), _smem(), _smem()] + [_blk()] * 7
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=_blk(),
        out_shape=jax.ShapeDtypeStruct((p, RAY_SUB, RAY_LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((RAY_SUB, RAY_LANE), jnp.float32),  # blocked
            pltpu.VMEM((LEAF_PAD, TRI_ROW), jnp.float32),
            pltpu.SMEM((STACK_CAP,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(meta, box, signs, ox, oy, oz, dx, dy, dz, tm, tris)


def _pad_flat(x, fill=0.0):
    n = x.shape[0]
    p = -(-n // PACKET_R)
    return jnp.pad(x, (0, p * PACKET_R - n), constant_values=fill), n


def _substitute_masked(comps, tm, unit_fallback=False):
    """Replace masked rays' (tmax < 0) components with their packet's
    mean over live rays. The general interval kernels cull with per-packet
    origin/direction INTERVALS (_ival_bounds_g), so garbage origins/dirs
    on masked rays (e.g. miss points at BIG) would blow the interval open
    and kill every cull; the mean of the live rays lies inside the
    packet's own interval, so the bounds do not widen at all. Masked
    rays' intersections are discarded via tmax < 0 regardless."""
    mask = tm >= 0.0
    maskp = mask.reshape(-1, PACKET_R)
    nlive = jnp.maximum(maskp.sum(axis=1), 1)
    means = []
    for c in comps:
        cm = jnp.where(mask, c, 0.0).reshape(-1, PACKET_R)
        means.append(jnp.repeat(cm.sum(axis=1) / nlive, PACKET_R))
    if unit_fallback:  # fully-masked packets: keep idir finite
        mlen = sum(m * m for m in means)
        means[2] = jnp.where(mlen < 1e-12, 1.0, means[2])
    return tuple(jnp.where(mask, c, m) for c, m in zip(comps, means))


def closest_hit_c(scene, o3, d3, tmax):
    """Component-planar closest hit: o3/d3 = (x, y, z) flat (R,) arrays.

    Returns (dist, u, v, tri) flat (R,). miss -> BIG, masked -> -BIG.

    Routing: paged scenes and leaf_max <= IVAL_LEAF take the general
    interval kernels (per-ray-origin walk + node mask; paged variant
    pages node subtrees on demand — this is what makes bounce rays work
    at any scene size, reference scene_inl.h:434-458 + traverse.cpp with
    no node cap); fat-leaf flat scenes keep the vector-culled kernel."""
    ox, n = _pad_flat(o3[0])
    oy, _ = _pad_flat(o3[1])
    oz, _ = _pad_flat(o3[2])
    dx, _ = _pad_flat(d3[0], 1.0)
    dy, _ = _pad_flat(d3[1], 1.0)
    dz, _ = _pad_flat(d3[2], 1.0)
    tm, _ = _pad_flat(tmax, -BIG)
    pk = _pk
    paged = getattr(scene, "pg_meta", None) is not None
    if _wl_available(scene):
        ox, oy, oz = _substitute_masked((ox, oy, oz), tm)
        dx, dy, dz = _substitute_masked((dx, dy, dz), tm,
                                        unit_fallback=True)
        wlw = _run_words_general(pk(ox), pk(oy), pk(oz), pk(dx),
                                 pk(dy), pk(dz), pk(tm), scene.lf_boxv,
                                 WL_BANDS, scene.wl_nl)
        dist, u, v, tri = _run_closest_wl_g(
            scene.wl_lfc, pk(ox), pk(oy), pk(oz), pk(dx), pk(dy),
            pk(dz), pk(tm), scene.pk_tris, scene.wl_boxrows,
            wlw, WL_BANDS, scene.lf_boxv.shape[1],
        )
        f = lambda a: a.reshape(-1)[:n]
        return f(dist), f(u), f(v), f(tri)
    if paged or scene.leaf_max <= IVAL_LEAF:
        ox, oy, oz = _substitute_masked((ox, oy, oz), tm)
        dx, dy, dz = _substitute_masked((dx, dy, dz), tm,
                                        unit_fallback=True)
        masks = (_general_mask_words(scene.mk_boxv, pk(ox), pk(oy),
                                     pk(oz), pk(dx), pk(dy), pk(dz),
                                     pk(tm))
                 if _NMASK else _dummy_masks(pk(dx).shape[0]))
        if paged:
            dist, u, v, tri = _run_closest_ival_g_paged(
                scene.pk_meta, scene.pk_box,
                pk(ox), pk(oy), pk(oz), pk(dx), pk(dy), pk(dz), pk(tm),
                scene.pk_tris, scene.pg_meta, scene.pg_box, masks,
                scene.mk_off, scene.mk_cap,
            )
        else:
            dist, u, v, tri = _run_closest_ival_g(
                scene.pk_meta, scene.pk_box,
                pk(ox), pk(oy), pk(oz), pk(dx), pk(dy), pk(dz), pk(tm),
                scene.pk_tris, masks,
            )
        f = lambda a: a.reshape(-1)[:n]
        return f(dist), f(u), f(v), f(tri)
    signs = _signs_of(pk(dx)[:, 0, 0], pk(dy)[:, 0, 0], pk(dz)[:, 0, 0])
    dist, u, v, tri = _run_closest(
        scene.pk_meta, scene.pk_box, signs,
        pk(ox), pk(oy), pk(oz), pk(dx), pk(dy), pk(dz), pk(tm),
        scene.pk_tris,
    )
    f = lambda a: a.reshape(-1)[:n]
    return f(dist), f(u), f(v), f(tri)


WL_SORT_TRIS = int(os.environ.get("SNAIL_WL_SORT", 0))
# shadow-ray regroup threshold (scene tris, 0 = off): re-pack shadow
# rays by receiver locality before the kernel. Measured NEGATIVE on the
# 1 Mtri terrain (leaf candidates/packet 1733 -> 3333): endpoint-compact
# packets whose direction interval straddles a zero component lose that
# axis's cull entirely, and enough packets do that the average worsens.
# Kept env-gated for future work (the fix is a span-aware packet split
# or per-quarter direction intervals in the words kernel).


@jax.jit
def _shadow_sort_perm(light, dx, dy, dz, tm, root_lo, root_hi):
    """Permutation packing shadow rays by RECEIVER locality: Morton
    order of the ray endpoints (light + d * tmax). Screen-tile shadow
    packets on big open scenes have near-scene-wide light cones (a
    grazing 64x64-pixel tile's world footprint is a kilometer strip)
    and the per-packet interval cull passes thousands of leaf
    candidates; endpoint-sorted packets subtend narrow light pyramids.
    The reference shoots shadow packets per screen block and eats the
    same blowup (scene_inl.h:127-140) — ray regrouping is the wavefront
    move it could not afford."""
    ex = light[0] + dx * jnp.maximum(tm, 0.0)
    ey = light[1] + dy * jnp.maximum(tm, 0.0)
    ez = light[2] + dz * jnp.maximum(tm, 0.0)
    inv = 1023.0 / jnp.maximum(root_hi - root_lo, 1e-6)

    def q(c, lo, iv):
        x = jnp.clip(((c - lo) * iv), 0.0, 1023.0).astype(jnp.uint32)
        # spread 10 bits -> every 3rd bit (Morton)
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    code = (q(ex, root_lo[0], inv[0])
            | (q(ey, root_lo[1], inv[1]) << 1)
            | (q(ez, root_lo[2], inv[2]) << 2))
    # masked rays (tm < 0) sort to the back as whole no-op packets
    # masked rays sort to the back as whole no-op packets (int32:
    # morton codes use 30 bits, the sentinel is the max positive value)
    code = jnp.where(tm >= 0.0, code.astype(jnp.int32),
                     jnp.int32(2**31 - 1))
    return jnp.argsort(code)


def any_hit_shared(scene, light_pos, d3, tmax):
    """Shadow any-hit from a shared origin. Returns blocked bool (R,).

    Large scenes (> WL_SORT_TRIS tris) re-pack the rays by endpoint
    Morton order first (see _shadow_sort_perm) and scatter the verdicts
    back — two 1M-element gathers buy an order of magnitude fewer leaf
    candidates per packet on open terrain."""
    if (WL_SORT_TRIS > 0 and _WL
            and getattr(scene, "wl_boxrows", None) is not None
            and scene.num_tris > WL_SORT_TRIS):
        lp = jnp.asarray(light_pos, jnp.float32)
        perm = _shadow_sort_perm(lp, d3[0], d3[1], d3[2], tmax,
                                 scene.node_lo[0], scene.node_hi[0])
        ds = tuple(jnp.take(c, perm) for c in d3)
        tms = jnp.take(tmax, perm)
        blocked = _any_hit_shared_impl(scene, light_pos, ds, tms)
        inv = jnp.argsort(perm)
        return jnp.take(blocked, inv)
    return _any_hit_shared_impl(scene, light_pos, d3, tmax)


def _any_hit_shared_impl(scene, light_pos, d3, tmax):
    dx, n = _pad_flat(d3[0], 1.0)
    dy, _ = _pad_flat(d3[1], 1.0)
    dz, _ = _pad_flat(d3[2], 1.0)
    tm, _ = _pad_flat(tmax, -BIG)
    orig = jnp.pad(jnp.asarray(light_pos, jnp.float32), (0, 1))
    pk = _pk
    if _wl_available(scene):
        # any-hit needs no ordering: one band, scan-and-drain
        wlw = _run_words_shared(orig, pk(dx), pk(dy), pk(dz), pk(tm),
                                scene.lf_boxv, 1, scene.wl_nl)
        raw = _wl_raw_tris(scene)
        out = _run_shadow_wl(
            scene.wl_lfc, orig, pk(dx), pk(dy), pk(dz), pk(tm),
            scene.pk_tris if raw else shared_rows(
                scene.pk_tris, jnp.asarray(light_pos, jnp.float32)),
            scene.wl_boxrows, wlw, 1, scene.lf_boxv.shape[1], raw,
        )
        return out.reshape(-1)[:n] > 0.0
    paged = getattr(scene, "pg_meta", None) is not None
    if paged or scene.leaf_max <= IVAL_LEAF:
        masks = (_shared_mask_words(scene.mk_boxv, orig, pk(dx), pk(dy),
                                    pk(dz), pk(tm))
                 if _NMASK else _dummy_masks(pk(dx).shape[0]))
    if paged:
        out = _run_shadow_ival_paged(
            scene.pk_meta, scene.pk_box, orig,
            pk(dx), pk(dy), pk(dz), pk(tm),
            shared_rows(scene.pk_tris, jnp.asarray(light_pos, jnp.float32)),
            scene.pg_meta, scene.pg_box, masks,
            scene.mk_off, scene.mk_cap,
        )
        return out.reshape(-1)[:n] > 0.0
    if scene.leaf_max <= IVAL_LEAF:
        out = _run_shadow_ival(
            scene.pk_meta, scene.pk_box, orig,
            pk(dx), pk(dy), pk(dz), pk(tm),
            shared_rows(scene.pk_tris, jnp.asarray(light_pos, jnp.float32)),
            masks,
        )
        return out.reshape(-1)[:n] > 0.0
    signs = _signs_of(pk(dx)[:, 0, 0], pk(dy)[:, 0, 0], pk(dz)[:, 0, 0])
    out = _run_shadow(
        scene.pk_meta, scene.pk_box, orig, signs,
        pk(dx), pk(dy), pk(dz), pk(tm), scene.pk_tris,
    )
    return out.reshape(-1)[:n] > 0.0


# --- (R, 3) AoS compatibility wrappers (the dispatch seam / tests) --------


def pallas_closest_hit(scene, orig, dirn, tmax):
    """Wavefront closest hit, AoS (R, 3) interface. Same conventions as
    traverse_bvh_ref: miss -> BIG, masked (tmax<0) -> -BIG."""
    o3 = (orig[:, 0], orig[:, 1], orig[:, 2])
    d3 = (dirn[:, 0], dirn[:, 1], dirn[:, 2])
    dist, u, v, tri = closest_hit_c(scene, o3, d3, tmax)
    active = tmax >= 0.0
    init = jnp.minimum(tmax, BIG)
    dist = jnp.where(dist < init, dist, BIG)
    dist = jnp.where(active, dist, -BIG)
    return dist, tri, jnp.stack([u, v], axis=-1)


def any_hit_c(scene, o3, d3, tmax):
    """Component-planar any-hit with per-ray origins. blocked bool (R,).

    Routing as closest_hit_c: interval kernels (flat or paged) when
    leaves fit; round-1 vector-culled kernel for fat-leaf flat scenes."""
    ox, n = _pad_flat(o3[0])
    oy, _ = _pad_flat(o3[1])
    oz, _ = _pad_flat(o3[2])
    dx, _ = _pad_flat(d3[0], 1.0)
    dy, _ = _pad_flat(d3[1], 1.0)
    dz, _ = _pad_flat(d3[2], 1.0)
    tm, _ = _pad_flat(tmax, -BIG)
    pk = _pk
    paged = getattr(scene, "pg_meta", None) is not None
    if _wl_available(scene):
        ox, oy, oz = _substitute_masked((ox, oy, oz), tm)
        dx, dy, dz = _substitute_masked((dx, dy, dz), tm,
                                        unit_fallback=True)
        wlw = _run_words_general(pk(ox), pk(oy), pk(oz), pk(dx),
                                 pk(dy), pk(dz), pk(tm), scene.lf_boxv,
                                 1, scene.wl_nl)
        out = _run_shadow_wl_g(
            scene.wl_lfc, pk(ox), pk(oy), pk(oz), pk(dx), pk(dy),
            pk(dz), pk(tm), scene.pk_tris, scene.wl_boxrows,
            wlw, 1, scene.lf_boxv.shape[1],
        )
        return out.reshape(-1)[:n] > 0.0
    if paged or scene.leaf_max <= IVAL_LEAF:
        ox, oy, oz = _substitute_masked((ox, oy, oz), tm)
        dx, dy, dz = _substitute_masked((dx, dy, dz), tm,
                                        unit_fallback=True)
        masks = (_general_mask_words(scene.mk_boxv, pk(ox), pk(oy),
                                     pk(oz), pk(dx), pk(dy), pk(dz),
                                     pk(tm))
                 if _NMASK else _dummy_masks(pk(dx).shape[0]))
        if paged:
            out = _run_shadow_ival_g_paged(
                scene.pk_meta, scene.pk_box,
                pk(ox), pk(oy), pk(oz), pk(dx), pk(dy), pk(dz), pk(tm),
                scene.pk_tris, scene.pg_meta, scene.pg_box, masks,
                scene.mk_off, scene.mk_cap,
            )
        else:
            out = _run_shadow_ival_g(
                scene.pk_meta, scene.pk_box,
                pk(ox), pk(oy), pk(oz), pk(dx), pk(dy), pk(dz), pk(tm),
                scene.pk_tris, masks,
            )
        return out.reshape(-1)[:n] > 0.0
    signs = _signs_of(pk(dx)[:, 0, 0], pk(dy)[:, 0, 0], pk(dz)[:, 0, 0])
    out = _run_shadow_g(
        scene.pk_meta, scene.pk_box, signs,
        pk(ox), pk(oy), pk(oz), pk(dx), pk(dy), pk(dz), pk(tm),
        scene.pk_tris,
    )
    return out.reshape(-1)[:n] > 0.0


def pallas_any_hit(scene, orig, dirn, tmax):
    """AoS any-hit with per-ray origins (general kernel). The integrator's
    shadow pass uses :func:`any_hit_shared` directly — lights are shared
    origins (scene_inl.h:127-129) and skip the origin arrays entirely."""
    o3 = (orig[:, 0], orig[:, 1], orig[:, 2])
    d3 = (dirn[:, 0], dirn[:, 1], dirn[:, 2])
    blocked = any_hit_c(scene, o3, d3, tmax)
    return blocked & (tmax >= 0.0)
