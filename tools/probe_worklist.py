"""Round-5 design probes for the drain-only (worklist) kernels.

Measures on the real chip:
  1. feline per-packet stats: nodes popped / leaves enqueued per packet
     (sizes the worklist cap and tells us what the walk actually does);
  2. XLA compaction strategies for building per-packet sorted leaf
     worklists: full sort_key_val, top_k, argsort — cost per frame at
     the (P, L) shapes we need;
  3. the current dense mask-pass cost for reference.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def probe_stats():
    from snail_tpu.core.types import Light, RenderOpts
    from snail_tpu.render.fast import render_frame_fast_stats
    from snail_tpu.scene.scene import load_scene

    lights = Light.make((5.0, 15.0, 5.0), (1.0, 1.0, 1.0), 60.0)
    scene = load_scene("/root/reference/scenes/feline.obj",
                       cache_dir="/tmp/snail_dump", lights=lights)
    import bench
    cam = bench._camera_for(scene)
    img, stats = render_frame_fast_stats(
        scene, cam, 1024, 1024,
        RenderOpts(reflections=False, transparency=False, textures=False))
    p = (1024 // 64) ** 2
    n_nodes = scene.pk_meta.shape[0] // 2
    n_tris = scene.num_tris
    print(f"feline: nodes={n_nodes} tris={n_tris} leaf_max={scene.leaf_max}")
    print(f"stats totals: {stats}")
    # per-packet: two wavefronts (camera + 1 shadow) -> 2*p packets
    print(f"  nodes/packet   = {stats['nodes'] / (2 * p):.1f}")
    print(f"  leaves/packet  = {stats['leaves'] / (2 * p):.1f}")
    print(f"  chunks/packet  = {stats['chunks'] / (2 * p):.1f}")
    print(f"  quarters/leaf  = {stats['quarters'] / max(stats['leaves'],1):.2f}")
    return n_nodes


def probe_sort(L):
    P = 256
    key = jax.random.randint(jax.random.PRNGKey(0), (P, L), 0, 1 << 30,
                             dtype=jnp.int32)
    val = jax.random.randint(jax.random.PRNGKey(1), (P, L), 0, 1 << 30,
                             dtype=jnp.int32)

    @jax.jit
    def full_sort(k, v):
        return jax.lax.sort_key_val(k, v, dimension=1)

    @jax.jit
    def sort_only(k):
        return jnp.sort(k, axis=1)

    @jax.jit
    def topk(k):
        return jax.lax.top_k(-k, 1024)

    @jax.jit
    def topk2k(k):
        return jax.lax.top_k(-k, 2048)

    @jax.jit
    def cumsum_count(k):
        b = (k & 1).astype(jnp.int32)
        return jnp.cumsum(b, axis=1), b.sum(axis=1)

    print(f"L={L}:")
    print(f"  sort_key_val : {timeit(full_sort, key, val)*1e3:8.2f} ms")
    print(f"  sort only    : {timeit(sort_only, key)*1e3:8.2f} ms")
    print(f"  top_k 1024   : {timeit(topk, key)*1e3:8.2f} ms")
    print(f"  top_k 2048   : {timeit(topk2k, key)*1e3:8.2f} ms")
    print(f"  cumsum       : {timeit(cumsum_count, key)*1e3:8.2f} ms")


def probe_masks():
    """Current dense mask pass cost on feline-sized tables."""
    from snail_tpu.ops.traverse_pallas import compute_masks
    nv = 24  # feline ~23k nodes -> 24 vreg blocks
    P = 256
    mk = jnp.asarray(np.random.rand(6, nv, 8, 128), jnp.float32)
    im = jnp.asarray(np.random.rand(P, 3), jnp.float32)
    iM = im + 1.0
    om = jnp.zeros((P, 3), jnp.float32)
    mb = jnp.full((P,), 100.0, jnp.float32)
    f = jax.jit(compute_masks)
    print(f"compute_masks nv={nv} P={P}: {timeit(f, mk, im, iM, om, om, mb)*1e3:.2f} ms")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "stats"):
        probe_stats()
    if which in ("all", "sort"):
        for L in (4096, 8192, 16384, 65536):
            probe_sort(L)
    if which in ("all", "masks"):
        probe_masks()
