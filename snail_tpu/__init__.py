"""snail_tpu — a TPU-native, differentiable Whitted-style ray tracing framework.

A from-scratch JAX/Pallas rebuild of the capabilities of nadult/Snail
(reference mounted at /root/reference):

- ``snail_tpu.core``     — math primitives & pytree types (replaces veclib/ +
  src/rtbase*.h: the SIMD abstraction is jnp; masks are bool arrays).
- ``snail_tpu.scene``    — scene assembly: OBJ/MTL loaders, normals, materials,
  textures, lights, cameras (replaces src/base_scene.*, src/formats/,
  src/shading/, src/sampling/, src/camera.*, src/light.h).
- ``snail_tpu.bvh``      — SAH BVH build (binned + sweep) into flat
  device-friendly arrays, disk cache, two-level instancing
  (replaces src/bvh/, src/dbvh/, dump/ cache).
- ``snail_tpu.ops``      — the device compute path: Pallas packet-traversal
  kernels (closest-hit + any-hit) with HBM->VMEM leaf staging, plus pure-jnp
  oracle implementations (replaces src/bvh/traverse.cpp, src/triangle.cpp,
  src/spu/ kernels).
- ``snail_tpu.render``   — ray generation, the Whitted integrator, frame
  renderer, debug shaders (replaces src/scene_inl.h, src/scene_trace.cpp,
  src/render.*, src/ray_generator.*).
- ``snail_tpu.diff``     — gradients: custom VJP through traversal
  (no reference counterpart; BASELINE.json north star).
- ``snail_tpu.parallel`` — device meshes, tile sharding, multi-host init,
  the render service (replaces src/comm*, src/server.cpp, src/node.cpp,
  src/client.cpp, src/compression.*).
- ``snail_tpu.utils``    — stats counters, runtime debug toggles, image IO &
  comparison (replaces src/tree_stats.*, gVals, tools/compare_img.cpp).
"""

__version__ = "0.1.0"
