"""Traversal backend dispatch.

``closest_hit`` / ``any_hit`` route to the Pallas packet kernels on TPU and
to the jnp reference traversal elsewhere (or as forced by
``TracedScene.backend``). This is the seam the reference implements with
template instantiation over acceleration structures (Scene<BVH> vs
Scene<DBVH>) and, per node type, the SPU-vs-x86 split (node.cpp:330-338).
"""

from __future__ import annotations

import jax

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


def any_hit(scene, orig, dirn, tmax):
    """blocked [R] bool; tmax<0 masked (never blocked)."""
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
