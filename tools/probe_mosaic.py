"""Verify Mosaic primitives needed by the drain-only kernels:
  1. scalar jax.lax.clz (bit-scan: ctz(w) = 31 - clz(w & -w));
  2. dynamic row slice of a VMEM ref by a traced scalar index;
  3. scalar while-loop popping bits of an SMEM word.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(words_ref, boxes_hbm, out_ref, cnt_ref, bscr, sem):
    # --- bit scan over SMEM words with clz-based ctz ---
    nw = words_ref.shape[0]

    def word_body(wi, c):
        n = c
        word = words_ref[wi]

        def bit_body(c2):
            w, n = c2
            low = w & (-w)
            b = 31 - jax.lax.clz(low)
            leaf = wi * 32 + b
            cnt_ref[n] = leaf
            return w & (w - 1), n + 1

        _, n = jax.lax.while_loop(lambda c2: c2[0] != 0, bit_body, (word, n))
        return n

    n = jax.lax.fori_loop(0, nw, word_body, 0)
    cnt_ref[127] = n

    # --- dynamic VMEM row slice by traced scalar ---
    idx = words_ref[0] & 63  # traced scalar
    cp = pltpu.make_async_copy(boxes_hbm.at[pl.ds(idx, 8), :], bscr, sem)
    cp.start()
    cp.wait()
    row = bscr[0:1, :]  # (1, 128)
    out_ref[:] = jnp.broadcast_to(row, out_ref.shape)


def main():
    nw = 8
    words = np.zeros(nw, np.int32)
    words[0] = 0b1010010  # bits 1, 4, 6 -> leaves 1, 4, 6
    words[3] = np.uint32(1 << 31 | 1).view(np.int32)  # leaves 96, 127
    boxes = np.arange(64 * 128, dtype=np.float32).reshape(64, 128)

    out, cnt = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((128,), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(jnp.asarray(words), jnp.asarray(boxes))
    cnt = np.asarray(cnt)
    n = cnt[127]
    print("leaves found:", cnt[:n], "count:", n)
    assert list(cnt[:n]) == [1, 4, 6, 96, 127], cnt[:n]
    row_idx = words[0] & 63
    assert np.allclose(np.asarray(out)[0], boxes[row_idx]), "dyn slice bad"
    print("dynamic VMEM slice ok (row", row_idx, ")")
    print("ALL OK")


if __name__ == "__main__":
    main()
