"""Multi-device rendering & training via jax.sharding — the rebuild of the
reference's distributed layer (SURVEY.md §2.4-2.5).

Mapping from the reference's MPI architecture to the TPU mesh:

  reference                              ->  here
  ---------------------------------------------------------------------
  DivideImage into 16x64 parts +            rays/tiles sharded over the
  static random assignment to nodes         mesh 'rays' axis (shard_map);
  (server.cpp:178-190, 233-265)             XLA owns placement
  full BVH broadcast to every node          scene pytree replicated
  (SendBVH server.cpp:144-164)              (every leaf P() = full copy)
  per-frame camera/lights/gVals Bcast       jit arguments (host->device
  (node.cpp:295-324)                        transfer of ~100B, like the
                                            reference's per-frame config)
  compressed tile relay node->server->      jnp all_gather of the
  client (server.cpp:389-401)               framebuffer shards (intra-pod
                                            ICI makes quicklz pointless)
  (north star) gradient all-reduce          psum over the mesh inside the
  overlapped with backward                  sharded train step; XLA
                                            schedules the overlap

Single-host multi-device and multi-host use the same code path: the mesh
spans all visible devices (jax.distributed handles process groups; see
snail_tpu.parallel.distributed).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.types import Camera, RenderOpts
from ..core.vecmath import BIG
from ..render.integrator import render_wavefront
from ..render.raygen import TILE_H, TILE_W, primary_rays, tile_rays, untile_image

AXIS = "rays"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D device mesh over the 'rays' axis (the image-space data
    parallelism of the reference, strategy P4 in SURVEY.md §2.4)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def shard_rays(mesh: Mesh, orig, dirn, tmax):
    """Place a wavefront with rays split across the mesh."""
    sh = jax.sharding.NamedSharding(mesh, P(AXIS))
    return (
        jax.device_put(orig, sh),
        jax.device_put(dirn, sh),
        jax.device_put(tmax, jax.sharding.NamedSharding(mesh, P(AXIS))),
    )


def _frame_rays(camera, width, height, supersample):
    scale = 2 if supersample else 1
    w, h = width * scale, height * scale
    th = TILE_H if h % TILE_H == 0 else 1
    tw = TILE_W if w % TILE_W == 0 else 1
    origin, dirs = primary_rays(camera, w, h)
    d = tile_rays(dirs, th, tw).reshape(-1, 3)
    o = jnp.broadcast_to(origin, d.shape)
    tmax = jnp.full(d.shape[:1], BIG, jnp.float32)
    return o, d, tmax, (w, h, th, tw)


@partial(jax.jit, static_argnames=("width", "height", "mesh"))
def render_frame_sharded(scene, camera: Camera, width: int, height: int,
                         opts: RenderOpts, mesh: Mesh):
    """Full frame with rays sharded across the mesh; scene replicated.

    The per-device body is exactly the single-chip integrator — shard_map
    gives each device its contiguous ray range (a tile range, like a
    reference node's part list) and the output is gathered by XLA.
    """
    o, d, tmax, (w, h, th, tw) = _frame_rays(
        camera, width, height, opts.supersample
    )
    # rays shard on TILE boundaries whenever the packet count divides the
    # mesh (the common case: any pow-2 frame), so the uv-footprint mip
    # selection survives sharding (VERDICT r2 weak #9); only ragged
    # frames fall back to mip 0
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    tiled = (w * h) % (n_dev * th * tw) == 0
    tile_hw = (th, tw) if tiled else None

    def body(o, d, tmax, scene):
        return render_wavefront(scene, o, d, tmax, opts, tile_hw=tile_hw)

    color = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=P(AXIS),
        check_rep=False,
    )(o, d, tmax, scene)

    img = untile_image(color.reshape(-1, th * tw, 3), h, w, th, tw)
    if opts.supersample:
        img = (
            img[0::2, 0::2] + img[1::2, 0::2] + img[0::2, 1::2]
            + img[1::2, 1::2]
        ) * 0.25
    return img


def train_step_sharded(scene, params, target, camera: Camera,
                       width: int, height: int, opts: RenderOpts,
                       mesh: Mesh, lr: float = 1e-3):
    """One differentiable-render training step, sharded.

    ``params`` is a dict of scene overrides (e.g. {"tri_a": ..,
    "mat_diffuse": ..}); forward renders the frame with rays sharded, loss
    is the L2 to ``target``, and parameter gradients are psum'd over the
    mesh — the north-star replacement for the reference's tile gather +
    (nonexistent) gradient path.

    Returns (loss, new_params). Designed to run inside jit.
    """
    o, d, tmax, (w, h, th, tw) = _frame_rays(
        camera, width, height, opts.supersample
    )
    tgt_tiles = tile_rays(target, th, tw).reshape(-1, 3)

    # GSPMD: annotate ray shardings and let XLA partition the whole
    # fwd+bwd graph and insert the gradient all-reduce over ICI — the
    # canonical sharding recipe, and the only AD-safe one (shard_map with
    # check_rep=False mis-reduces cotangents of replicated params; caught
    # by tests/test_distributed.py::test_sharded_grads_match_single_device)
    ray_sh = jax.sharding.NamedSharding(mesh, P(AXIS))
    o = jax.lax.with_sharding_constraint(o, ray_sh)
    d = jax.lax.with_sharding_constraint(d, ray_sh)
    tmax = jax.lax.with_sharding_constraint(tmax, ray_sh)
    tgt_tiles = jax.lax.with_sharding_constraint(tgt_tiles, ray_sh)

    def loss_fn(params):
        s = dataclasses.replace(scene, **params)
        color = render_wavefront(s, o, d, tmax, opts)
        return jnp.mean((color - tgt_tiles) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return loss, new_params
