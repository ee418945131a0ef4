"""Record the multi-device scaling table (SCALING_rN.json).

8 virtual CPU devices (the mpirun-on-one-box pattern, SURVEY §4.5):
measures parallel EFFICIENCY of the sharded render path — the CPU mesh
can't show absolute TPU throughput, but the collective/sharding overhead
it measures is the quantity the >=85% north star constrains (reference
node-scaling tables, benchmark.txt:76-129).

Usage: python tools/scaling_artifact.py [out.json]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
# the axon sitecustomize overrides JAX_PLATFORMS at interpreter start;
# a config update after import is the only reliable off-switch
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING_r03.json"
    from snail_tpu.bvh import build_bvh
    from snail_tpu.core.types import Camera, Light, RenderOpts
    from snail_tpu.parallel import distributed as dist
    from snail_tpu.scene.procedural import cornell_scene
    from snail_tpu.scene.scene import make_traced_scene

    base = cornell_scene()
    g = base.flatten()
    lo, hi = g.bounds()
    bvh = build_bvh(lo, hi, leaf_size=8)
    lights = Light.make((0.0, 3.5, 0.0), (1.0, 0.9, 0.8), 30.0)
    scene = make_traced_scene(g, bvh, lights=lights, backend="reference")
    cam = Camera.look_at(pos=(0.0, 2.0, 6.0), target=(0.0, 1.5, 0.0))
    opts = RenderOpts(reflections=False, transparency=False, textures=False)

    rows = dist.scaling_report(scene, cam, 256, 256, opts, (1, 2, 4, 8),
                               frames=3)
    doc = {
        "config": "cornell 256x256, 8 virtual CPU devices, tile-sharded "
                  "render (parallel/distributed.py)",
        "host_cores": os.cpu_count(),
        "rows": rows,
        "methodology": (
            "Virtual CPU devices share the host's physical cores (this "
            "box has %d), and the 1-device baseline is itself "
            "multi-threaded by XLA:CPU, so 'efficiency' here is a LOWER "
            "bound that saturates at the core count - it demonstrates "
            "the sharded path composes and speeds up, not the ICI "
            "ceiling. True multi-chip >=85%% efficiency is "
            "compile-validated by __graft_entry__.dryrun_multichip "
            "(8-device mesh, real shardings) and needs real multi-chip "
            "hardware to time (reference methodology "
            "benchmark.txt:76-129)." % os.cpu_count()
        ),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc), flush=True)


if __name__ == "__main__":
    main()
