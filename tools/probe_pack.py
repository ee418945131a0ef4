"""Probe Mosaic support for the in-kernel leaf-word packing:
  (nv, 8, 128) 0/1 -> lane-group 32-bit words (nv, 8, 4) -> flat (8, lw),
then VMEM->SMEM DMA of the packed rows.
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
NW = NV * 32
LW = 128


def kernel(ok_ref, out_ref, wvm, wsm, sem):
    ok = ok_ref[:]  # (NV, 8, 128) int32 0/1
    lane32 = jax.lax.broadcasted_iota(jnp.int32, (NV, 8, 128), 2) & 31
    w = jnp.left_shift(ok, lane32).reshape(NV, 8, 4, 32)
    w2 = jnp.sum(w, axis=3).reshape(-1)  # (NW,)
    w2 = jnp.pad(w2, (0, 8 * LW - NW)).reshape(8, LW)
    wvm[:, :] = w2
    cp = pltpu.make_async_copy(wvm, wsm, sem)
    cp.start()
    cp.wait()
    # read back a few words via the scalar core to prove SMEM access
    for i in range(8):
        out_ref[i] = wsm[i >> 7, i & 127]
    out_ref[8] = wsm[0, 127]


def main():
    rng = np.random.default_rng(0)
    ok = (rng.random((NV, 8, 128)) < 0.1).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((16,), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, LW), jnp.int32),
                        pltpu.SMEM((8, LW), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
    )(jnp.asarray(ok))
    out = np.asarray(out)
    # reference packing (the XLA-side compute_leaf_words layout)
    w1 = ok[:, 0, :].astype(np.int64)
    for sb in range(1, 8):
        w1 = w1 | (ok[:, sb, :].astype(np.int64) << sb)
    w1 = w1.reshape(NV, 32, 4)
    w2 = (w1[:, :, 0] | (w1[:, :, 1] << 8) | (w1[:, :, 2] << 16)
          | (w1[:, :, 3] << 24)).reshape(-1)
    # NOTE: kernel packs lane-major ((lane&31) bit of word (blk*32+?)) --
    # check against the KERNEL's own convention instead:
    ref = np.zeros(NW, np.int64)
    for blk in range(NV):
        for sb in range(8):
            for lane in range(128):
                if ok[blk, sb, lane]:
                    i = blk * 1024 + sb * 128 + lane
                    # kernel layout: (blk, sb, g) word, bit lane&31
                    wdx = blk * 32 + sb * 4 + (lane >> 5)
                    ref[wdx] |= 1 << (lane & 31)
    got = out[:8].astype(np.uint32)
    want = ref[:8].astype(np.uint32)
    print("got ", got)
    print("want", want)
    print("xla-layout word0", np.uint32(w2[0]))
    print("MATCH" if (got == want).all() else "MISMATCH")


if __name__ == "__main__":
    main()
