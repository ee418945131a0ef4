"""Traversal backend dispatch.

``closest_hit`` / ``any_hit`` route to the Pallas packet kernels on TPU and
to the jnp reference traversal elsewhere (or as forced by
``TracedScene.backend``). This is the seam the reference implements with
template instantiation over acceleration structures (Scene<BVH> vs
Scene<DBVH>) and, per node type, the SPU-vs-x86 split (node.cpp:330-338).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .traverse_ref import traverse_bvh_ref, traverse_bvh_shadow_ref


def _use_pallas(scene) -> bool:
    if scene.backend == "reference" or scene.pk_meta is None:
        return False
    if scene.backend == "pallas":
        return True
    return jax.default_backend() in ("tpu", "axon")


def closest_hit(scene, orig, dirn, tmax):
    """(dist, tri, bary[...,2]); dist==BIG miss, dist<0 masked ray."""
    if _use_pallas(scene):
        from .traverse_pallas import pallas_closest_hit

        return pallas_closest_hit(scene, orig, dirn, tmax)
    return traverse_bvh_ref(
        scene.node_lo,
        scene.node_hi,
        scene.node_child,
        scene.node_count,
        scene.node_axis,
        scene.node_first,
        scene.tri_a,
        scene.tri_ba,
        scene.tri_ca,
        orig,
        dirn,
        tmax,
        leaf_max=scene.leaf_max,
    )


def any_hit_from(scene, origin, dirn, tmax):
    """Shared-origin any-hit: all rays start at ``origin`` (shadow rays
    are traced FROM the light, scene_inl.h:127-129). blocked [R] bool.

    On the Pallas path this reaches the decoupled interval shadow kernel,
    which needs tight per-packet direction intervals — masked rays
    (tmax < 0) carry garbage directions, so they are substituted with
    their packet's mean valid direction (a point inside the packet's own
    cone; their intersections are discarded via tmax < 0 regardless).

    Occlusion is boolean — no gradient flows through it — so inputs are
    stop_gradient'ed here, which also lets this run under jax.grad on the
    Pallas path (pallas_call has no AD rule)."""
    sg = jax.lax.stop_gradient
    scene, origin, dirn, tmax = sg(scene), sg(origin), sg(dirn), sg(tmax)
    if _use_pallas(scene):
        from .traverse_pallas import PACKET_R, any_hit_shared

        n = dirn.shape[0]
        pad = (-n) % PACKET_R
        d = jnp.pad(dirn, ((0, pad), (0, 0)))
        tm = jnp.pad(tmax, (0, pad), constant_values=-1.0)
        mask = tm >= 0.0

        def pkmean(c):
            cm = jnp.where(mask, c, 0.0).reshape(-1, PACKET_R)
            return cm.sum(axis=1) / jnp.maximum(
                mask.reshape(-1, PACKET_R).sum(axis=1), 1
            )

        md = [jnp.repeat(pkmean(d[:, k]), PACKET_R) for k in range(3)]
        mlen = md[0] ** 2 + md[1] ** 2 + md[2] ** 2
        md[2] = jnp.where(mlen < 1e-12, 1.0, md[2])
        sd = tuple(jnp.where(mask, d[:, k], md[k]) for k in range(3))
        blocked = any_hit_shared(scene, origin, sd, tm)
        return blocked[:n] & (tmax >= 0.0)
    orig = jnp.broadcast_to(origin, dirn.shape)
    return traverse_bvh_shadow_ref(
        scene.node_lo,
        scene.node_hi,
        scene.node_child,
        scene.node_count,
        scene.node_axis,
        scene.node_first,
        scene.tri_a,
        scene.tri_ba,
        scene.tri_ca,
        orig,
        dirn,
        tmax,
        leaf_max=scene.leaf_max,
    )


def any_hit(scene, orig, dirn, tmax):
    """blocked [R] bool; tmax<0 masked (never blocked). Inputs are
    stop_gradient'ed (boolean output; see any_hit_from)."""
    sg = jax.lax.stop_gradient
    scene, orig, dirn, tmax = sg(scene), sg(orig), sg(dirn), sg(tmax)
    if _use_pallas(scene):
        from .traverse_pallas import pallas_any_hit

        return pallas_any_hit(scene, orig, dirn, tmax)
    return traverse_bvh_shadow_ref(
        scene.node_lo,
        scene.node_hi,
        scene.node_child,
        scene.node_count,
        scene.node_axis,
        scene.node_first,
        scene.tri_a,
        scene.tri_ba,
        scene.tri_ca,
        orig,
        dirn,
        tmax,
        leaf_max=scene.leaf_max,
    )
