"""Probe the MXU-based word packing for the fused leaf pass:
  ok (nv,8,128) -> A (nv*8,128) [leading-dim merge reshape]
  Pb = dot_general(Wp, A, contract lane dims) -> (128, R) packed+transposed
  w32 = lo + hi<<16; summary via small dot; bitcast f32<->i32.
Verifies numerics against a NumPy reference.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NV = 5
R = NV * 8
RP = 128  # padded lane dim of outputs


def kernel(ok_ref, wout_ref, sout_ref, bout_ref):
    ok = ok_ref[:]  # (NV, 8, 128) i32 0/1
    a2 = ok.reshape(NV * 8, 128).astype(jnp.float32)
    l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    pw = jnp.left_shift(1, l & 15).astype(jnp.float32)
    low = (c == jax.lax.shift_right_logical(l, 5)) & (
        (jax.lax.shift_right_logical(l, 4) & 1) == 0)
    high = (c == 4 + jax.lax.shift_right_logical(l, 5)) & (
        (jax.lax.shift_right_logical(l, 4) & 1) == 1)
    wp = jnp.where(low | high, pw, 0.0)
    pb = jax.lax.dot_general(wp, a2, (((0,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (128, R)
    lo = pb[0:4, :].astype(jnp.int32)
    hi = pb[4:8, :].astype(jnp.int32)
    w32 = lo | jnp.left_shift(hi, 16)  # (4, R)
    wout_ref[:, 0:R] = w32
    wout_ref[:, R:] = jnp.zeros((4, RP - R), jnp.int32)

    # summary: nz (4, R) -> (4, NV) 8-bit lane-group packs -> one row
    nz = (w32 != 0).astype(jnp.float32)
    l2 = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    ws = jnp.where(c2 == jax.lax.shift_right_logical(l2, 3),
                   jnp.left_shift(1, l2 & 7).astype(jnp.float32), 0.0)
    m = jax.lax.dot_general(nz, ws, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (4, 128)
    mi = m.astype(jnp.int32)
    su = (mi[0:1] | jnp.left_shift(mi[1:2], 8)
          | jnp.left_shift(mi[2:3], 16) | jnp.left_shift(mi[3:4], 24))
    sout_ref[:, :] = su

    # f32 -> i32 bitcast row
    blo = jnp.full((1, RP), 3.25, jnp.float32)
    bout_ref[:, :] = pltpu.bitcast(blo, jnp.int32)


def main():
    rng = np.random.default_rng(0)
    ok = (rng.random((NV, 8, 128)) < 0.08).astype(np.int32)
    w, s, b = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((4, RP), jnp.int32),
                   jax.ShapeDtypeStruct((1, 128), jnp.int32),
                   jax.ShapeDtypeStruct((1, RP), jnp.int32)],
    )(jnp.asarray(ok))
    w, s, b = np.asarray(w), np.asarray(s), np.asarray(b)
    # reference: word (g, r=blk*8+sb) bit p = leaf blk*1024+sb*128+g*32+p
    ref = np.zeros((4, R), np.uint32)
    for blk in range(NV):
        for sb in range(8):
            for lane in range(128):
                if ok[blk, sb, lane]:
                    g, p = lane >> 5, lane & 31
                    ref[g, blk * 8 + sb] |= np.uint32(1) << p
    assert (w[:, :R].view(np.uint32) == ref).all(), "WORDS MISMATCH"
    sref = np.zeros(NV, np.uint32)
    for blk in range(NV):
        for sb in range(8):
            for g in range(4):
                if ref[g, blk * 8 + sb]:
                    sref[blk] |= np.uint32(1) << (g * 8 + sb)
    assert (s[0, :NV].view(np.uint32) == sref).all(), "SUMMARY MISMATCH"
    assert b[0, 0].view(np.float32) if False else np.float32(
        np.asarray(b[0, 0]).view(np.float32)) == np.float32(3.25)
    print("ALL OK")


if __name__ == "__main__":
    main()
