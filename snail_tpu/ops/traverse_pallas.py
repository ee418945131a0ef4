"""Pallas TPU packet-traversal kernels (closest-hit + any-hit shadow).

This is the TPU-native heart of the framework — the rebuild of the
reference's SSE packet traversal (src/bvh/traverse.cpp) and of its Cell SPU
kernel design (src/spu/trace.cpp), mapped onto the TPU memory hierarchy:

  reference                         ->  here
  ------------------------------------------------------------------
  RayGroup 256-ray packet              one kernel grid instance owns a
  (64 quads, QuadLevels=3)             PACKET_R-ray tile in VMEM
  per-packet traversal stack           int32 stack in SMEM scratch
  (StackElem[maxDepth+2])              (traverse.cpp:17)
  32-byte BVH node (tree.h:60-72)      16-byte SMEM node: child/count/axis
                                       packed in one word + bbox quantized
                                       to u16 grid over the root box
                                       (conservative floor/ceil rounding)
  per-node interval + per-ray slab     one vectorized slab test over all
  tests + [first,last] narrowing       packet rays (VPU lanes replace the
  (bounding_box.cpp:62-142)            narrowing loop); any() -> descend
  near-child via firstNode ^           identical, with the sign bits
  sign[axis] (traverse.cpp:71-74)      precomputed per packet in SMEM and
                                       firstNode stolen from a low
                                       quantization bit
  SPU DMA triangle cache               leaf triangle blocks DMA'd
  (spu/base.h:85-135)                  HBM->VMEM per leaf visit
  MultiCollide 4-triangle unroll       4 triangles packed across VPU
  (spu/triangle.h:23-38)               sublanes: one (4, R) intersection
                                       evaluates 4 tris x R rays
  shadow early full-occlusion exit     jnp.all(blocked) clears the stack
  (traverse.cpp:117-121)

Why SMEM: Mosaic has no dynamic scalar loads from VMEM, and traversal is
scalar control flow — so the tree must live where the scalar core can
randomly index it. SMEM is ~0.25 MB usable, hence the 16-byte quantized
node and fat leaves (``LEAF_PAD`` tris, default 64) that push geometry bytes
into HBM-streamed leaf blocks where the VPU brute-forces them — the TPU
answer to the reference's "packet vs leaf" balance. Capacity: ~14k nodes ≈
1-2 M triangles; bigger scenes need the (future) two-level scheme and fall
back to the jnp path meanwhile.

Triangle HBM layout: ``tris (Tpad, 128) f32`` rows = [a(3), ba(3), ca(3),
nrm(3), pad(116)] — a full 128-lane row per triangle (Mosaic DMA slices
need a 128-multiple lane dim), padded so any leaf DMA of LEAF_PAD rows
stays in bounds.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.vecmath import BIG

PACKET_R = 256  # rays per packet (the reference packet size)
STACK_CAP = 96  # maxDepth(64) + slack (reference uses maxDepth+2)
LEAF_PAD = 64  # leaf DMA granule (rows); builder leaf_size must be <= this
NODE_WORDS = 4  # packed int32 words per node in SMEM
TRI_ROW = 128  # floats per triangle row (lane-aligned for DMA slicing)
SMEM_NODE_CAP = 14336  # ~224 KB of node table; probed safe is 256 KB


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


# ---------------------------------------------------------------------------
# Packing (host side)
# ---------------------------------------------------------------------------


def pack_scene_arrays(bvh, geom_padded):
    """Pack BVH + triangles into kernel layouts.

    Returns (table i32[4*N], aux f32[8], tris f32[Tpad, 16]).

    Node word layout (word 0):  [31] unused, [30:9] child/first (22 bits),
    [8:2] count (7 bits, 0 for inner), [1:0] split axis.
    Words 1-3: bbox lo/hi quantized to u16 over the root box, packed two
    per word: w1 = qlox | qloy<<16, w2 = qloz | qhix<<16, w3 = qhiy|qhiz<<16.
    The near-child bit (reference Node::firstNode) is stolen from the low
    bit of qlox (conservative: floor rounding only loosens the box).
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

    root_lo = bvh.node_lo[0].astype(np.float64)
    root_hi = bvh.node_hi[0].astype(np.float64)
    ext = np.maximum(root_hi - root_lo, 1e-20)
    inv_cell = 65535.0 / ext
    cell = ext / 65535.0

    qlo = np.floor((bvh.node_lo - root_lo) * inv_cell).astype(np.int64)
    qhi = np.ceil((bvh.node_hi - root_lo) * inv_cell).astype(np.int64)
    qlo = np.clip(qlo, 0, 65535).astype(np.uint32)
    qhi = np.clip(qhi, 0, 65535).astype(np.uint32)
    # steal qlox bit 0 for firstNode (clearing it only loosens lo bound)
    qlo[:, 0] = (qlo[:, 0] & 0xFFFE) | (bvh.first_node.astype(np.uint32) & 1)

    w0 = (
        (bvh.child.astype(np.uint32) << 9)
        | ((bvh.count.astype(np.uint32) & 0x7F) << 2)
        | (bvh.axis.astype(np.uint32) & 0x3)
    )
    w1 = qlo[:, 0] | (qlo[:, 1] << 16)
    w2 = qlo[:, 2] | (qhi[:, 0] << 16)
    w3 = qhi[:, 1] | (qhi[:, 2] << 16)
    table = np.stack([w0, w1, w2, w3], axis=1).astype(np.uint32)
    table = table.reshape(-1).view(np.int32)

    aux = np.zeros(8, np.float32)
    aux[0:3] = root_lo
    aux[3:6] = cell

    t = len(geom_padded.a)
    # One triangle per 128-float row: Mosaic requires DMA-sliced arrays to
    # have a 128-multiple lane dimension, so the 16 used floats live in the
    # first lanes of a full 128-lane row (bandwidth cost revisited later).
    tris = np.zeros((t, TRI_ROW), np.float32)
    tris[:, 0:3] = geom_padded.a
    tris[:, 3:6] = geom_padded.ba
    tris[:, 6:9] = geom_padded.ca
    tris[:, 9:12] = np.cross(geom_padded.ba, geom_padded.ca)
    return table, aux, tris


# ---------------------------------------------------------------------------
# Kernel helpers
# ---------------------------------------------------------------------------


def _unpack_node(tbl_ref, aux_ref, node):
    """Scalar unpack of one node -> (child, count, axis, fnode, lo3, hi3)."""
    base = node * NODE_WORDS
    w0 = tbl_ref[base]
    w1 = tbl_ref[base + 1]
    w2 = tbl_ref[base + 2]
    w3 = tbl_ref[base + 3]
    child = jax.lax.shift_right_logical(w0, 9)
    count = jax.lax.shift_right_logical(w0, 2) & 0x7F
    axis = w0 & 0x3
    fnode = w1 & 0x1

    def dq(q, k):
        return aux_ref[k] + q.astype(jnp.float32) * aux_ref[3 + k]

    lox = dq((w1 & 0xFFFE), 0)
    loy = dq(jax.lax.shift_right_logical(w1, 16) & 0xFFFF, 1)
    loz = dq(w2 & 0xFFFF, 2)
    hix = dq(jax.lax.shift_right_logical(w2, 16) & 0xFFFF, 0)
    hiy = dq(w3 & 0xFFFF, 1)
    hiz = dq(jax.lax.shift_right_logical(w3, 16) & 0xFFFF, 2)
    return child, count, axis, fnode, (lox, loy, loz), (hix, hiy, hiz)


def _slab_any(o, idir, lo, hi, best):
    """Vectorized slab test of one box vs the whole packet -> scalar any.

    The per-ray version of BBox::Test (bounding_box.cpp:62-142) with the
    current-distance cull; VPU lanes replace the [first,last] narrowing."""
    t10 = (lo[0] - o[0:1]) * idir[0:1]
    t20 = (hi[0] - o[0:1]) * idir[0:1]
    t11 = (lo[1] - o[1:2]) * idir[1:2]
    t21 = (hi[1] - o[1:2]) * idir[1:2]
    t12 = (lo[2] - o[2:3]) * idir[2:3]
    t22 = (hi[2] - o[2:3]) * idir[2:3]
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t10, t20), jnp.minimum(t11, t21)),
        jnp.minimum(t12, t22),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t10, t20), jnp.maximum(t11, t21)),
        jnp.maximum(t12, t22),
    )
    return jnp.any((tn <= tf) & (tf > 0.0) & (tn < best))


def _tri_cols(ts, r0):
    """Static (4,1) component slices of the staged leaf block."""
    return [ts[r0 : r0 + 4, j : j + 1] for j in range(12)]


def _intersect4(o, d, cols):
    """4 triangles x R rays, (4, R) vectorized (MultiCollide analogue).

    Returns (det, u, v, tmul) raw values (caller applies side rules)."""
    ax, ay, az, bax, bay, baz, cax, cay, caz, nx, ny, nz = cols
    ox, oy, oz = o[0:1], o[1:2], o[2:3]
    dx, dy, dz = d[0:1], d[1:2], d[2:3]
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


# ---------------------------------------------------------------------------
# Closest-hit kernel
# ---------------------------------------------------------------------------


def _closest_kernel(tbl_ref, aux_ref, signs_ref, rays_ref, tris_hbm,
                    outf_ref, outi_ref,
                    best_ref, bu_ref, bv_ref, tri_ref,
                    tscratch, stack_ref, sem):
    o = rays_ref[0, 0:3, :]
    d = rays_ref[0, 3:6, :]
    tmax = rays_ref[0, 7:8, :]
    idir = 1.0 / (d + 1e-8)  # SafeInv (rtbase.h:117-120)
    sign_base = pl.program_id(0) * 4  # hoisted: program_id inside lax.cond
    # branches has no interpret-mode lowering

    active = tmax >= 0.0
    best_ref[:, :] = jnp.where(active, jnp.minimum(tmax, BIG), -BIG)
    bu_ref[:, :] = jnp.zeros_like(tmax)
    bv_ref[:, :] = jnp.zeros_like(tmax)
    tri_ref[:, :] = jnp.zeros(tmax.shape, jnp.int32)

    def process_leaf(first, count):
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
                row = jax.lax.broadcasted_iota(jnp.int32, (4, 1), 0)
                ok = side & (det != 0.0) & (dist > 0.0) & ((r0 + row) < count)
                dist = jnp.where(ok, dist, BIG)
                m = jnp.min(dist, axis=0, keepdims=True)  # (1, R)
                upd = m < best_ref[:, :]
                is_min = (dist == m) & ok
                ids = first + r0 + row
                tid = jnp.min(
                    jnp.where(is_min, ids, jnp.int32(2**30)),
                    axis=0, keepdims=True,
                )
                sel_u = jnp.max(jnp.where(is_min, u * idet, -BIG),
                                axis=0, keepdims=True)
                sel_v = jnp.max(jnp.where(is_min, v * idet, -BIG),
                                axis=0, keepdims=True)
                best_ref[:, :] = jnp.where(upd, m, best_ref[:, :])
                tri_ref[:, :] = jnp.where(upd, tid, tri_ref[:, :])
                bu_ref[:, :] = jnp.where(upd, sel_u, bu_ref[:, :])
                bv_ref[:, :] = jnp.where(upd, sel_v, bv_ref[:, :])

    def body(sp):
        node = stack_ref[sp - 1]
        sp = sp - 1
        child, count, axis, fnode, lo, hi = _unpack_node(
            tbl_ref, aux_ref, node
        )

        def leaf_case(sp):
            process_leaf(child, count)
            return sp

        def inner_case(sp):
            sign = signs_ref[sign_base + axis]
            near = child + (fnode ^ sign)
            far = child + (1 - (fnode ^ sign))
            _, _, _, _, flo, fhi = _unpack_node(tbl_ref, aux_ref, far)
            _, _, _, _, nlo, nhi = _unpack_node(tbl_ref, aux_ref, near)
            hit_far = _slab_any(o, idir, flo, fhi, best_ref[:, :])
            hit_near = _slab_any(o, idir, nlo, nhi, best_ref[:, :])

            def push(sp, n):
                stack_ref[sp] = n
                return sp + 1

            sp = jax.lax.cond(hit_far, lambda s: push(s, far),
                              lambda s: s, sp)
            sp = jax.lax.cond(hit_near, lambda s: push(s, near),
                              lambda s: s, sp)
            return sp

        return jax.lax.cond(count > 0, leaf_case, inner_case, sp)

    _, _, _, _, rlo, rhi = _unpack_node(tbl_ref, aux_ref, 0)
    root_ok = _slab_any(o, idir, rlo, rhi, best_ref[:, :])
    stack_ref[0] = 0
    sp0 = jax.lax.cond(root_ok, lambda: 1, lambda: 0)
    jax.lax.while_loop(lambda sp: sp > 0, body, sp0)

    outf_ref[0, 0:1, :] = best_ref[:, :]
    outf_ref[0, 1:2, :] = bu_ref[:, :]
    outf_ref[0, 2:3, :] = bv_ref[:, :]
    outf_ref[0, 3:4, :] = tmax
    outi_ref[0, :, :] = tri_ref[:, :]


# ---------------------------------------------------------------------------
# Shadow (any-hit) kernel
# ---------------------------------------------------------------------------


def _shadow_kernel(tbl_ref, aux_ref, signs_ref, rays_ref, tris_hbm,
                   out_ref, blocked_ref, tscratch, stack_ref, sem):
    o = rays_ref[0, 0:3, :]
    d = rays_ref[0, 3:6, :]
    tmax = rays_ref[0, 7:8, :]
    idir = 1.0 / (d + 1e-8)
    sign_base = pl.program_id(0) * 4

    active = tmax >= 0.0
    blocked_ref[:, :] = jnp.zeros(tmax.shape, jnp.float32)
    limit = jnp.where(active, tmax, -BIG)

    def process_leaf(first, count):
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
                row = jax.lax.broadcasted_iota(jnp.int32, (4, 1), 0)
                # single-sided shadow rule (triangle.cpp:95-96)
                occ = (
                    (jnp.minimum(u, v) >= 0.0)
                    & (u + v <= det)
                    & (tmul > 0.0)
                    & (tmul < tmax * det)
                    & ((r0 + row) < count)
                )
                occ_any = jnp.max(
                    jnp.where(occ, 1.0, 0.0), axis=0, keepdims=True
                )
                blocked_ref[:, :] = jnp.maximum(blocked_ref[:, :], occ_any)

    def open_limit():
        return jnp.where(blocked_ref[:, :] > 0.0, -BIG, limit)

    def body(sp):
        node = stack_ref[sp - 1]
        sp = sp - 1
        child, count, axis, fnode, lo, hi = _unpack_node(
            tbl_ref, aux_ref, node
        )

        def leaf_case(sp):
            process_leaf(child, count)
            # full-occlusion early exit (traverse.cpp:117-121)
            done = jnp.all((blocked_ref[:, :] > 0.0) | (limit < 0.0))
            return jax.lax.cond(done, lambda s: 0, lambda s: s, sp)

        def inner_case(sp):
            sign = signs_ref[sign_base + axis]
            near = child + (fnode ^ sign)
            far = child + (1 - (fnode ^ sign))
            _, _, _, _, flo, fhi = _unpack_node(tbl_ref, aux_ref, far)
            _, _, _, _, nlo, nhi = _unpack_node(tbl_ref, aux_ref, near)
            lim = open_limit()
            hit_far = _slab_any(o, idir, flo, fhi, lim)
            hit_near = _slab_any(o, idir, nlo, nhi, lim)

            def push(sp, n):
                stack_ref[sp] = n
                return sp + 1

            sp = jax.lax.cond(hit_far, lambda s: push(s, far),
                              lambda s: s, sp)
            sp = jax.lax.cond(hit_near, lambda s: push(s, near),
                              lambda s: s, sp)
            return sp

        return jax.lax.cond(count > 0, leaf_case, inner_case, sp)

    _, _, _, _, rlo, rhi = _unpack_node(tbl_ref, aux_ref, 0)
    root_ok = _slab_any(o, idir, rlo, rhi, limit)
    stack_ref[0] = 0
    sp0 = jax.lax.cond(root_ok, lambda: 1, lambda: 0)
    jax.lax.while_loop(lambda sp: sp > 0, body, sp0)

    out_ref[0, :, :] = blocked_ref[:, :]


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------


def _pack_rays(orig, dirn, tmax, r=PACKET_R):
    n = orig.shape[0]
    p = -(-n // r)
    pad = p * r - n
    o = jnp.pad(orig, ((0, pad), (0, 0)))
    d = jnp.pad(dirn, ((0, pad), (0, 0)), constant_values=1.0)
    t = jnp.pad(tmax, (0, pad), constant_values=-BIG)
    rays = jnp.concatenate(
        [
            o.reshape(p, r, 3).transpose(0, 2, 1),
            d.reshape(p, r, 3).transpose(0, 2, 1),
            jnp.zeros((p, 1, r), o.dtype),
            t.reshape(p, 1, r),
        ],
        axis=1,
    )
    # per-packet direction sign bits of ray 0 (reference takes ray 0's sign,
    # traverse.cpp:21). Flat (P*4,) i32: SMEM pads 2-D arrays to 128 lanes
    # (4096-packet frame would eat 2 MB), 1-D arrays stay dense; the kernel
    # indexes [program_id*4 + axis].
    signs = (rays[:, 3:6, 0] < 0.0).astype(jnp.int32)
    signs = jnp.pad(signs, ((0, 0), (0, 1))).reshape(-1)
    return rays, signs, n, p


_CLOSEST_SCRATCH = lambda r: [
    pltpu.VMEM((1, r), jnp.float32),  # best
    pltpu.VMEM((1, r), jnp.float32),  # bu
    pltpu.VMEM((1, r), jnp.float32),  # bv
    pltpu.VMEM((1, r), jnp.int32),  # tri
    pltpu.VMEM((LEAF_PAD, TRI_ROW), jnp.float32),  # staged leaf block
    pltpu.SMEM((STACK_CAP,), jnp.int32),  # stack
    pltpu.SemaphoreType.DMA(()),
]


@jax.jit
def _run_closest(table, aux, signs, rays, tris):
    p, _, r = rays.shape
    return pl.pallas_call(
        _closest_kernel,
        grid=(p,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # node table
            pl.BlockSpec(memory_space=pltpu.SMEM),  # aux dequant consts
            pl.BlockSpec(memory_space=pltpu.SMEM),  # signs flat (P*4,)
            pl.BlockSpec((1, 8, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # tris
        ],
        out_specs=[
            pl.BlockSpec((1, 4, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p, 4, r), jnp.float32),
            jax.ShapeDtypeStruct((p, 1, r), jnp.int32),
        ],
        scratch_shapes=_CLOSEST_SCRATCH(r),
        interpret=_interpret(),
    )(table, aux, signs, rays, tris)


@jax.jit
def _run_shadow(table, aux, signs, rays, tris):
    p, _, r = rays.shape
    return pl.pallas_call(
        _shadow_kernel,
        grid=(p,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # signs flat (P*4,)
            pl.BlockSpec((1, 8, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, 1, r), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, r), jnp.float32),  # blocked
            pltpu.VMEM((LEAF_PAD, TRI_ROW), jnp.float32),
            pltpu.SMEM((STACK_CAP,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(table, aux, signs, rays, tris)


def pallas_closest_hit(scene, orig, dirn, tmax):
    """Wavefront closest hit via the packet kernel. Same conventions as
    traverse_bvh_ref: miss -> BIG, masked (tmax<0) -> -BIG."""
    rays, signs, n, p = _pack_rays(orig, dirn, tmax)
    outf, outi = _run_closest(
        scene.pk_table, scene.pk_aux, signs, rays, scene.pk_tris
    )
    dist = outf[:, 0, :].reshape(-1)[:n]
    u = outf[:, 1, :].reshape(-1)[:n]
    v = outf[:, 2, :].reshape(-1)[:n]
    tri = outi[:, 0, :].reshape(-1)[:n]
    active = tmax >= 0.0
    init = jnp.minimum(tmax, BIG)
    dist = jnp.where(dist < init, dist, BIG)
    dist = jnp.where(active, dist, -BIG)
    return dist, tri, jnp.stack([u, v], axis=-1)


def pallas_any_hit(scene, orig, dirn, tmax):
    rays, signs, n, p = _pack_rays(orig, dirn, tmax)
    out = _run_shadow(
        scene.pk_table, scene.pk_aux, signs, rays, scene.pk_tris
    )
    blocked = out[:, 0, :].reshape(-1)[:n] > 0.0
    return blocked & (tmax >= 0.0)
