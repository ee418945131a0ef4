"""Hardware probe: which HBM->SMEM / HBM->VMEM DMA slice shapes Mosaic
accepts. Drives the packed-triangle-row layout decision (4 vs 8 tris/row)
and the paged-table lane padding."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(rows, lanes, space, off_rows):
    """DMA (rows, lanes) slice at dynamic row offset into `space` scratch."""

    def kernel(src_hbm, off_ref, out_ref, scratch, sem):
        cp = pltpu.make_async_copy(
            src_hbm.at[pl.ds(off_ref[0], rows), :], scratch, sem
        )
        cp.start()
        cp.wait()
        acc = jnp.float32(0.0)
        if space == "smem":
            for r in range(rows):
                acc = acc + scratch[r, 0] + scratch[r, lanes - 1]
            out_ref[0] = acc
        else:
            out_ref[0] = jnp.sum(scratch[:, :])

    src = jnp.arange(64 * lanes, dtype=jnp.float32).reshape(64, lanes)
    off = jnp.array([off_rows], jnp.int32)
    scratch = (
        pltpu.SMEM((rows, lanes), jnp.float32)
        if space == "smem"
        else pltpu.VMEM((rows, lanes), jnp.float32)
    )
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
            scratch_shapes=[scratch, pltpu.SemaphoreType.DMA(())],
        )(src, off)
        got = float(out[0])
        s = np.arange(64 * lanes, dtype=np.float32).reshape(64, lanes)
        blk = s[off_rows : off_rows + rows]
        want = (
            float(blk[:, 0].sum() + blk[:, lanes - 1].sum())
            if space == "smem"
            else float(blk.sum())
        )
        ok = abs(got - want) < 1e-3 * max(1.0, abs(want))
        print(f"({rows:2d},{lanes:4d})->{space:4s} off={off_rows:2d}: "
              f"{'OK' if ok else f'WRONG {got} vs {want}'}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"({rows:2d},{lanes:4d})->{space:4s} off={off_rows:2d}: "
              f"FAIL {msg}", flush=True)


if __name__ == "__main__":
    for space in ("smem", "vmem"):
        for rows, off in ((4, 4), (8, 8), (4, 2), (2, 2), (8, 4), (16, 8)):
            probe(rows, 128, space, off)
    # 3D page-table shapes: (NP, 8, L) sliced at dim0
    def probe3(l8):
        def kernel(src_hbm, out_ref, scratch, sem):
            cp = pltpu.make_async_copy(src_hbm.at[1], scratch, sem)
            cp.start()
            cp.wait()
            out_ref[0] = scratch[0, 0] + scratch[7, l8 - 1]

        src = jnp.arange(4 * 8 * l8, dtype=jnp.float32).reshape(4, 8, l8)
        try:
            out = pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
                scratch_shapes=[pltpu.SMEM((8, l8), jnp.float32),
                                pltpu.SemaphoreType.DMA(())],
            )(src)
            s = np.arange(4 * 8 * l8, dtype=np.float32).reshape(4, 8, l8)
            want = float(s[1, 0, 0] + s[1, 7, l8 - 1])
            ok = abs(float(out[0]) - want) < 1e-3
            print(f"3D (NP,8,{l8:4d}) page slice: "
                  f"{'OK' if ok else 'WRONG'}", flush=True)
        except Exception as e:
            print(f"3D (NP,8,{l8:4d}) page slice: FAIL "
                  f"{str(e).splitlines()[0][:110]}", flush=True)

    for l8 in (16, 64, 128, 512):
        probe3(l8)
