"""Probe primitives for the big-scene worklist kernels:
  1. direct dynamic-start row read from a VMEM input ref (no DMA);
  2. (1, 128) row DMA HBM -> SMEM (per-leaf box fetch);
  3. (1, 8) row DMA HBM -> VMEM.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def k1(idx_ref, vm_ref, out_ref):
    i = idx_ref[0]
    row = vm_ref[pl.ds(i, 1), :]  # dynamic-start sublane slice, no DMA
    out_ref[:] = jnp.broadcast_to(row, out_ref.shape)


def k2(idx_ref, hbm_ref, out_ref, sscr, sem):
    i = idx_ref[0]
    cp = pltpu.make_async_copy(hbm_ref.at[pl.ds(i, 1), :], sscr, sem)
    cp.start()
    cp.wait()
    for j in range(8):
        out_ref[j] = sscr[0, j]


def main():
    boxes = np.arange(64 * 128, dtype=np.float32).reshape(64, 128)
    idx = np.array([13], np.int32)
    try:
        out = pl.pallas_call(
            k1,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(jnp.asarray(idx), jnp.asarray(boxes))
        ok = np.allclose(np.asarray(out)[0], boxes[13])
        print("k1 direct dynamic VMEM slice:", "OK" if ok else "WRONG")
    except Exception as e:
        print("k1 FAILED:", str(e).splitlines()[0][:120])

    try:
        out = pl.pallas_call(
            k2,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((8,), jnp.float32),
            scratch_shapes=[pltpu.SMEM((1, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
        )(jnp.asarray(idx), jnp.asarray(boxes))
        ok = np.allclose(np.asarray(out), boxes[13, :8])
        print("k2 (1,128) HBM->SMEM row DMA:", "OK" if ok else "WRONG")
    except Exception as e:
        print("k2 FAILED:", str(e).splitlines()[0][:120])


if __name__ == "__main__":
    main()
