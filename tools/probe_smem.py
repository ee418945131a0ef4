"""Hardware probe: how much SMEM scratch a kernel can allocate.

Decides SMEM_NODE_CAP (node meta i32[2N] + box f32[6N] = 32 B/node) and
whether ~1 Mtri scenes can stay single-level (65k nodes @ leaf 32 needs
~2.1 MB; 33k @ leaf 64 needs ~1.05 MB)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_kb(kb):
    n = kb * 256  # i32 words

    def kernel(out_ref, scratch):
        scratch[0] = 1
        scratch[n - 1] = 2
        out_ref[0] = scratch[0] + scratch[n - 1]

    try:
        out = pl.pallas_call(
            kernel,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            scratch_shapes=[pltpu.SMEM((n,), jnp.int32)],
        )()
        ok = int(out[0]) == 3
        print(f"SMEM {kb:5d} KB: {'OK' if ok else 'WRONG'}", flush=True)
        return ok
    except Exception as e:
        print(f"SMEM {kb:5d} KB: FAIL {str(e).splitlines()[0][:100]}",
              flush=True)
        return False


if __name__ == "__main__":
    for kb in (512, 1024, 1536, 2048, 2560, 3072, 4096, 6144, 8192):
        if not probe_kb(kb):
            break
