"""Pallas packet kernels vs the jnp reference traversal (interpret mode on
CPU; the veclib cross-backend-equivalence pattern, SURVEY.md §4.1)."""

import numpy as np
import pytest

import jax.numpy as jnp

from snail_tpu.bvh import build_bvh
from snail_tpu.core.vecmath import BIG
from snail_tpu.core.types import Light
from snail_tpu.scene.base_scene import BaseScene, SceneObject
from snail_tpu.scene.scene import make_traced_scene
from snail_tpu.ops import dispatch
from snail_tpu.ops.traverse_pallas import pallas_closest_hit, pallas_any_hit


def _random_scene(rng, n=200, spread=5.0, size=1.0):
    base = rng.uniform(-spread, spread, (n, 1, 3))
    tri = (base + rng.uniform(-size, size, (n, 3, 3))).astype(np.float32)
    obj = SceneObject(
        verts=tri.reshape(-1, 3),
        uvs=np.zeros((0, 2), np.float32),
        normals=np.zeros((0, 3), np.float32),
        tri_v=np.arange(n * 3, dtype=np.int32).reshape(n, 3),
        tri_vt=np.full((n, 3), -1, np.int32),
        tri_vn=np.full((n, 3), -1, np.int32),
        tri_mat=np.zeros(n, np.int32),
    )
    scene = BaseScene()
    scene.objects.append(obj)
    g = scene.flatten()
    lo, hi = g.bounds()
    bvh = build_bvh(lo, hi, leaf_size=8)
    return make_traced_scene(
        g, bvh, lights=Light.make((0, 20, 0), (1, 1, 1), 100.0)
    )


def _rays(rng, n_rays=512):
    orig = rng.uniform(-8, 8, (n_rays, 3)).astype(np.float32)
    tgt = rng.uniform(-5, 5, (n_rays, 3)).astype(np.float32)
    d = tgt - orig
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmax = np.full(n_rays, BIG, np.float32)
    tmax[:16] = -BIG  # masked
    return jnp.asarray(orig), jnp.asarray(d), jnp.asarray(tmax)


def test_pallas_closest_matches_reference(rng):
    scene = _random_scene(rng)
    orig, dirn, tmax = _rays(rng)

    rd, rt, rb = dispatch.closest_hit(scene.with_backend("reference"),
                                      orig, dirn, tmax)
    pd, pt, pb = pallas_closest_hit(scene, orig, dirn, tmax)

    rd, pd = np.asarray(rd), np.asarray(pd)
    hit_r = (rd > 0) & (rd < BIG)
    hit_p = (pd > 0) & (pd < BIG)
    np.testing.assert_array_equal(hit_r, hit_p)
    np.testing.assert_allclose(pd[hit_p], rd[hit_r], rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(pt)[hit_p], np.asarray(rt)[hit_r]
    )
    np.testing.assert_allclose(
        np.asarray(pb)[hit_p], np.asarray(rb)[hit_r], rtol=1e-4, atol=1e-5
    )
    # masked rays keep the sentinel
    assert (pd[np.asarray(tmax) < 0] < 0).all()


def test_pallas_shadow_matches_reference(rng):
    scene = _random_scene(rng, n=150)
    n_rays = 384
    light = np.array([0.0, 15.0, 0.0], np.float32)
    surf = rng.uniform(-4, 4, (n_rays, 3)).astype(np.float32)
    d = surf - light
    dist = np.linalg.norm(d, axis=-1)
    d /= dist[:, None]
    orig = np.broadcast_to(light, (n_rays, 3)).copy()
    tmax = (dist * 0.9999).astype(np.float32)
    tmax[:10] = -BIG

    rb = dispatch.any_hit(scene.with_backend("reference"),
                          jnp.asarray(orig), jnp.asarray(d), jnp.asarray(tmax))
    pb = pallas_any_hit(scene, jnp.asarray(orig), jnp.asarray(d),
                        jnp.asarray(tmax))
    np.testing.assert_array_equal(np.asarray(pb), np.asarray(rb))


def test_pallas_non_multiple_packet(rng):
    """Ray counts that don't divide the packet size get padded correctly."""
    scene = _random_scene(rng, n=64)
    orig, dirn, tmax = _rays(rng, n_rays=100)
    rd, rt, _ = dispatch.closest_hit(scene.with_backend("reference"),
                                     orig, dirn, tmax)
    pd, pt, _ = pallas_closest_hit(scene, orig, dirn, tmax)
    rd, pd = np.asarray(rd), np.asarray(pd)
    np.testing.assert_allclose(
        pd[(rd > 0) & (rd < BIG)], rd[(rd > 0) & (rd < BIG)], rtol=1e-5
    )


def test_ival_camera_trace_matches_reference(rng):
    """The decoupled interval-traversal camera kernel (scalar walk + leaf
    DMA ring) against the jnp reference, full 64x64 frame of primary rays
    (leaf_size <= IVAL_LEAF selects the ival path in camera_trace)."""
    from snail_tpu.core.types import Camera
    from snail_tpu.ops.traverse_pallas import (
        IVAL_LEAF, TILE, camera_trace, kernel_ray_index,
    )
    from snail_tpu.render.raygen import primary_rays

    scene = _random_scene(rng, n=300)
    assert scene.leaf_max <= IVAL_LEAF
    cam = Camera.look_at(pos=(9.0, 7.0, 11.0), target=(0.0, 0.0, 0.0))
    w = h = TILE
    dist, u, v, tri, dx, dy, dz = camera_trace(scene, cam, w, h)

    origin, dirs = primary_rays(cam, w, h)
    # reorder the raster-order oracle rays into the kernel's packet order
    d = dirs.reshape(-1, 3)[kernel_ray_index(w, h)]
    o = jnp.broadcast_to(origin, d.shape)
    tmax = jnp.full(d.shape[:1], BIG, jnp.float32)
    rd, rt, rb = dispatch.closest_hit(
        scene.with_backend("reference"), o, d, tmax
    )

    # Tolerance provenance (kernel vs jnp oracle, both f32):
    # - dist 2e-4: the camera kernel intersects with PER-FRAME
    #   shared-origin precomputed rows (c1 = (o-a) x ca etc., XLA) while
    #   the oracle forms tv = o - a per ray and crosses in a different
    #   association order; on hardware Mosaic additionally contracts
    #   a*b+c into fma. Each reassociation costs ~1 ulp on catastrophic-
    #   cancellation-prone cross products; 2e-4 relative on dists of
    #   O(10) covers the observed worst case (~6e-5) with margin.
    # - tri id 0.1%: ids differ ONLY where two triangles intersect the
    #   ray at distances within that same fp noise (mesh edges shared by
    #   two faces) — the kernel's first-improvement-by-traversal-order
    #   then picks a different but equally-correct winner than the
    #   oracle's. The distances still agree (checked above), so this is
    #   a tie-break, not an error.
    # - u/v 2e-3: barycentrics divide by det, amplifying the same edge-
    #   grazing cancellation (det -> 0 exactly where ids tie-break).
    np.testing.assert_allclose(np.asarray(dist), np.asarray(rd),
                               rtol=2e-4, atol=2e-4)
    hit = np.asarray(rd) < BIG
    assert (np.asarray(tri)[hit] == np.asarray(rt)[hit]).mean() > 0.999
    np.testing.assert_allclose(np.asarray(u)[hit],
                               np.asarray(rb)[hit, 0], atol=2e-3)
    np.testing.assert_allclose(np.asarray(v)[hit],
                               np.asarray(rb)[hit, 1], atol=2e-3)


def test_ival_shadow_matches_reference(rng):
    """any_hit_shared via the interval kernel vs the jnp reference."""
    from snail_tpu.ops.traverse_pallas import IVAL_LEAF, any_hit_shared

    scene = _random_scene(rng, n=300)
    assert scene.leaf_max <= IVAL_LEAF
    light = np.array([0.0, 20.0, 0.0], np.float32)
    n = 2048
    tgt = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    d = tgt - light
    ld = np.linalg.norm(d, axis=-1)
    d = d / ld[:, None]
    tmax = (ld * 0.9999).astype(np.float32)
    tmax[:64] = -BIG  # masked rays

    blocked = any_hit_shared(
        scene, jnp.asarray(light),
        (jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
        jnp.asarray(tmax),
    )
    orig = jnp.broadcast_to(jnp.asarray(light), (n, 3))
    ref = dispatch.any_hit(
        scene.with_backend("reference"), orig, jnp.asarray(d),
        jnp.asarray(tmax)
    )
    pb = np.asarray(blocked) & (tmax >= 0)
    rb = np.asarray(ref) & (tmax >= 0)
    # 0.1% disagreement allowance: shadow rays end 1e-4 * dist short of
    # the surface (the 0.9999 epsilon), so a blocker AT the endpoint
    # passes `tmul < tmax * det` in one evaluation order and fails in
    # the other (shared-origin precompute + fma vs the oracle's per-ray
    # math — same ~1-ulp sources as the closest-hit note above). Only
    # rays whose occluder sits exactly at the epsilon boundary can
    # differ; with random target points that is < 1e-3 of rays.
    assert (pb == rb).mean() > 0.999
