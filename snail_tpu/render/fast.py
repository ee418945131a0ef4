"""Packed (component-planar) Whitted render path — the TPU fast lane.

Same integrator semantics as :mod:`snail_tpu.render.integrator` (the
rebuild of Scene::RayTrace, reference src/scene_inl.h:169-496) but every
wavefront quantity is a flat (R,) float32 array in TILE x TILE (64x64)
pixel packet
order, so nothing ever crosses lanes:

- primary rays come straight out of the camera-fused Pallas kernel
  (zero ray IO — snail_tpu.ops.traverse_pallas.camera_trace);
- shading data comes from one (R,16) row gather of scene.sh_pack
  plus one of scene.mat_pack (64-B rows, the ShTriangle fetch-unit idea);
- shadow rays reuse the shared-origin any-hit kernel (lights are shared
  origins, scene_inl.h:127-129);
- secondary bounces go through closest_hit_c with component arrays;
- the single AoS step left is the final (3, H, W) -> (H, W, 3) image
  transpose.

This path is forward-only and pallas-only; the differentiable/portable
path stays in integrator.py. Numerics (attenuation polynomial, 0.9999
shadow epsilon, dot^16 specular) are identical — see integrator.py for
the reference citations.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.types import Camera, Light, RenderOpts
from ..core.vecmath import BIG
from ..ops.traverse_pallas import (
    QX,
    TILE,
    any_hit_shared,
    camera_trace,
    closest_hit_c,
)


def _packets_to_image(cr, cg, cb, width: int, height: int):
    """Kernel packet order -> (H, W, 3) image. Rays arrive as TILE x TILE
    pixel tiles cut into 32x32-pixel quadrants (traverse_pallas._pixel_xy):
    flat order is (ty, tx, qy, qx, iy, ix). One transpose, like the
    reference's Z-order Decompose (ray_generator.cpp:83-150)."""
    img = jnp.stack([cr, cg, cb], axis=0).reshape(
        3, height // TILE, width // TILE, TILE // 32, QX, 32, 32
    )
    img = img.transpose(1, 3, 5, 2, 4, 6, 0).reshape(height, width, 3)
    return img


def _take(a, idx):
    return jnp.take(a, idx, axis=0)


def _gather_cols(tbl, idx):
    """Row gather returning components as (C, R) — rays in LANES.

    An (R, C) f32 gather output with C < 128 is lane-padded to (R, 128)
    on TPU: 512 MB of layout traffic per Mray. Gathering the transposed
    table along axis 1 keeps the output dense (C sublanes x R lanes) and
    component reads are plain sublane slices."""
    return jnp.take(tbl.T, idx, axis=1)


@jax.custom_vjp
def _small_lookup(tbl, idx):
    """(C, R) lookup from a SMALL (M, C) table as a one-hot matmul.

    The forward rides the MXU: (C, M) @ (M, R). The BACKWARD is a
    custom VJP of M masked row-sums — XLA's scatter-add of 1M colliding
    cotangent rows into a handful of material rows measured ~60 ms, and
    letting it transpose the one-hot matmul measured ~180 ms at M=1
    (a degenerate (M, R) @ (R, C) contraction XLA schedules terribly);
    the masked sums are exact and O(M) cheap reductions."""
    m = tbl.shape[0]
    onehot = (jnp.arange(m, dtype=jnp.int32)[:, None] == idx[None, :])
    return tbl.T @ onehot.astype(jnp.float32)


def _small_lookup_fwd(tbl, idx):
    return _small_lookup(tbl, idx), (idx, tbl.shape[0])


def _small_lookup_bwd(res, g):
    idx, m = res
    d = jnp.stack([
        jnp.sum(jnp.where(idx[None, :] == mm, g, 0.0), axis=1)
        for mm in range(m)
    ])
    return d, None


_small_lookup.defvjp(_small_lookup_fwd, _small_lookup_bwd)


def _shade_and_light(scene, o3, d3, dist, u, v, tri, opts: RenderOpts,
                     depth: int, diff: bool = False, stats_out=None,
                     sh_row=None, normals=None, any_hit=None, bounce=None,
                     tile_hw=(32, 32), photon_grid=None):
    """Shading + lights + bounces for one traced wavefront (components).

    o3 may be a shared origin tuple of scalars (primary) or (R,) arrays.
    Returns color components (r, g, b).

    ``normals``/``any_hit``/``bounce`` plug alternate tracers into the
    SAME shading path — instanced scenes (scene/instancing.py) pass
    world-rotated normals and DBVH-backed visibility/bounce tracers and
    get the full Whitted treatment (reference dbvh/traverse.cpp:14-76
    feeding the same Scene::RayTrace).

    ``diff=True`` is the differentiable variant: material colors are
    gathered from the primal ``mat_diffuse``/``mat_specular`` tables (so
    parameter gradients flow) instead of the denormalized ``sh_pack`` row,
    and every Pallas kernel call sees only stop-gradient'ed inputs
    (traversal topology is piecewise-constant, snail_tpu/diff/vjp.py)."""
    sg = jax.lax.stop_gradient
    hit = (dist > 0.0) & (dist < BIG)
    st = jnp.where(hit, tri, 0)
    # ONE row gather per hit: shading deltas + the denormalized material
    # row together (the ShTriangle one-cache-line fetch, triangle.h:
    # 181-230, widened — a TPU gather costs ~7.4 ms per 1M rows
    # regardless of row width, so everything rides one gather), in the
    # transposed (C, R) form (see _gather_cols); the diff path passes
    # its own shared gather's columns in (sh_row).
    sh = sh_row if sh_row is not None else _gather_cols(scene.sh_pack, st)
    if normals is None:
        nx = sh[0] + sh[3] * u + sh[6] * v
        ny = sh[1] + sh[4] * u + sh[7] * v
        nz = sh[2] + sh[5] * u + sh[8] * v
    else:
        nx, ny, nz = normals

    mp = sh[16:32]  # material row, no second gather
    if diff:
        # diff=True assumes the 42-row _diff_pack gather (mat id at row
        # 41); a plain 32-row sh_pack gather would silently clamp the
        # out-of-range row index to 31 — fail loudly instead
        assert sh.shape[0] >= 42, (
            "diff=True needs the _diff_pack sh_row (42 rows), got "
            f"{sh.shape[0]}"
        )
        # primal material colors by mat id (id rides the packed row);
        # transposed small-table gathers keep (3, R) outputs dense
        mid = sh[41].astype(jnp.int32)
        kd = _small_lookup(scene.mat_diffuse, mid)
        ks = _small_lookup(scene.mat_specular, mid)
        kdr, kdg, kdb = kd[0], kd[1], kd[2]
        ksr, ksg, ksb = ks[0], ks[1], ks[2]
    else:
        kdr, kdg, kdb = mp[0], mp[1], mp[2]
        ksr, ksg, ksb = mp[3], mp[4], mp[5]

    dx, dy, dz = d3
    if opts.textures and scene.tex_atlas is not None:
        uc = sh[9] + sh[11] * u + sh[13] * v
        vc = sh[10] + sh[12] * u + sh[14] * v
        tex_id = mp[8].astype(jnp.int32)
        from ..scene.textures import (sample_atlas, sample_sat_atlas,
                                      uv_footprint)

        uvs = jnp.stack([uc, vc], axis=-1)
        # texDiff mip selection (scene_inl.h:294) for primary rays, whose
        # 32x32-quadrant packet order preserves pixel adjacency (every
        # block of 1024 consecutive rays is one 32x32 pixel raster,
        # traverse_pallas._pixel_xy); bounce wavefronts have no screen
        # footprint -> mip 0 (reference computes texDiff per primary 2x2
        # block only). Callers with a different ray tiling (instancing)
        # pass their own tile_hw; tile_hw=None or a degenerate (1, 1)
        # tiling disables the footprint instead of computing garbage.
        use_fp = (depth == 0 and tile_hw is not None
                  and tile_hw[0] * tile_hw[1] > 1
                  and uvs.shape[0] % (tile_hw[0] * tile_hw[1]) == 0)
        diff_uv = uv_footprint(uvs, tile_hw, hit) if use_fp else None
        if (opts.tex_filter == "sat" and scene.tex_sat is not None
                and diff_uv is not None):
            rgb = sample_sat_atlas(scene.tex_sat, scene.tex_meta, tex_id,
                                   uvs, diff_uv)
        else:
            rgb = sample_atlas(scene.tex_atlas, scene.tex_meta, tex_id,
                               uvs, diff_uv,
                               filter=("bilinear"
                                       if opts.tex_filter == "bilinear"
                                       else "point"))
        has = tex_id >= 0
        kdr = jnp.where(has, rgb[..., 0], kdr)
        kdg = jnp.where(has, rgb[..., 1], kdg)
        kdb = jnp.where(has, rgb[..., 2], kdb)

    ndotd = jnp.abs(dx * nx + dy * ny + dz * nz)
    dr = jnp.where(hit, kdr * ndotd, 0.0)
    dg = jnp.where(hit, kdg * ndotd, 0.0)
    db = jnp.where(hit, kdb * ndotd, 0.0)

    # hit position components. Miss rays carry dist = BIG; pushing them
    # through the light-distance math would overflow to inf and an
    # inf/nan forward value under a masked-out where still poisons the
    # VJP (0 cotangent x inf = nan — this surfaced as a non-finite
    # camera-position gradient in the round-4 bench). Their positions
    # are never used, so collapse them to the origin.
    safe_dist = jnp.where(hit, dist, 0.0)
    px = o3[0] + dx * safe_dist
    py = o3[1] + dy * safe_dist
    pz = o3[2] + dz * safe_dist

    # --- reflections (scene_inl.h:434-444) ---
    # the whole bounce runs under lax.cond on "any ray selected" — the
    # reference only recurses when the per-block reflection selector is
    # non-empty (scene_inl.h:264-265, 434), and a fully-masked bounce
    # wavefront still paid ~90 ms/frame of kernel launches, gathers and
    # its own shadow pass before this skip
    if (opts.reflections and depth < opts.max_bounces
            and getattr(scene, "has_refl", True)):
        refl = jnp.where(hit, mp[6], 0.0)
        rsel = hit & (refl > 0.0)
        dn = dx * nx + dy * ny + dz * nz
        rdx = dx - 2.0 * dn * nx
        rdy = dy - 2.0 * dn * ny
        rdz = dz - 2.0 * dn * nz
        rox = px + rdx * 0.001
        roy = py + rdy * 0.001
        roz = pz + rdz * 0.001
        rtm = jnp.where(rsel, BIG, -BIG)

        def _bounce_refl(args):
            rox, roy, roz, rdx, rdy, rdz, rtm = args
            if bounce is None:
                return _trace_and_shade(
                    scene, (rox, roy, roz), (rdx, rdy, rdz), rtm, opts,
                    depth + 1, diff=diff,
                )
            return bounce((rox, roy, roz), (rdx, rdy, rdz), rtm,
                          depth + 1)

        def _no_bounce(args):
            z = jnp.zeros_like(args[0])
            return z, z, z

        if diff:
            # lax.cond's VJP blocks fusion in the backward (+30 ms
            # measured); the diff path keeps the unconditional bounce
            rr, rg, rb = _bounce_refl((rox, roy, roz, rdx, rdy, rdz,
                                       rtm))
        else:
            rr, rg, rb = jax.lax.cond(
                jnp.any(rsel), _bounce_refl, _no_bounce,
                (rox, roy, roz, rdx, rdy, rdz, rtm))
        dr = jnp.where(rsel, dr + (rr - dr) * refl, dr)
        dg = jnp.where(rsel, dg + (rg - dg) * refl, dg)
        db = jnp.where(rsel, db + (rb - db) * refl, db)

    # --- transparency continuation (scene_inl.h:445-458) ---
    if (opts.transparency and depth < opts.max_bounces
            and getattr(scene, "has_transp", True)):
        opac = jnp.where(hit, mp[7], 1.0)
        tsel = hit & (opac < 1.0)
        tox = px + dx * 0.1
        toy = py + dy * 0.1
        toz = pz + dz * 0.1
        ttm = jnp.where(tsel, BIG, -BIG)

        def _bounce_transp(args):
            tox, toy, toz, ttm = args
            if bounce is None:
                return _trace_and_shade(
                    scene, (tox, toy, toz), d3, ttm, opts, depth + 1,
                    diff=diff,
                )
            return bounce((tox, toy, toz), d3, ttm, depth + 1)

        def _no_transp(args):
            z = jnp.zeros_like(args[0])
            return z, z, z

        if diff:
            tr, tg, tb = _bounce_transp((tox, toy, toz, ttm))
        else:
            tr, tg, tb = jax.lax.cond(
                jnp.any(tsel), _bounce_transp, _no_transp,
                (tox, toy, toz, ttm))
        dr = jnp.where(tsel, tr + (dr - tr) * opac, dr)
        dg = jnp.where(tsel, tg + (dg - tg) * opac, dg)
        db = jnp.where(tsel, tb + (db - tb) * opac, db)

    # --- lights (TraceLight, scene_inl.h:89-167) ---
    ldr = jnp.full_like(dr, opts.ambient)
    ldg = jnp.full_like(dr, opts.ambient)
    ldb = jnp.full_like(dr, opts.ambient)
    lsr = jnp.zeros_like(dr)
    lsg = jnp.zeros_like(dr)
    lsb = jnp.zeros_like(dr)
    lights: Optional[Light] = scene.lights
    n_lights = 0 if lights is None else lights.pos.shape[0]
    for i in range(n_lights):
        lp = lights.pos[i]
        lvx = px - lp[0]
        lvy = py - lp[1]
        lvz = pz - lp[2]
        ld2 = lvx * lvx + lvy * lvy + lvz * lvz
        ldist = jnp.sqrt(jnp.maximum(ld2, 1e-12))
        ild = 1.0 / ldist
        flx = lvx * ild
        fly = lvy * ild
        flz = lvz * ild
        dot = nx * flx + ny * fly + nz * flz
        mask = hit & (dot > 0.0)
        if opts.shadows:
            stm = jnp.where(mask, ldist * 0.9999, -BIG)
            if any_hit is None:
                # Masked rays (misses, backfaces) carry garbage
                # directions (hit position at dist=BIG); they would blow
                # the packet's direction interval wide open and defeat
                # the scalar interval culls. Substitute each packet's
                # mean valid direction - a point inside the packet's own
                # cone, so the interval bounds don't widen at all.
                # (Unnormalized is fine: the kernel culls with the idir
                # bounds of the values actually passed, and masked rays'
                # intersections are discarded via tmax < 0.) Alternate
                # tracers (any_hit override, e.g. instancing) skip the
                # substitution: it only serves the packet kernels and
                # assumes R is a PACKET_R multiple.
                from ..ops.traverse_pallas import PACKET_R

                def _pkmean(c):
                    cm = jnp.where(mask, c, 0.0).reshape(-1, PACKET_R)
                    return cm.sum(axis=1) / jnp.maximum(
                        mask.reshape(-1, PACKET_R).sum(axis=1), 1
                    )

                mdx = jnp.repeat(_pkmean(flx), PACKET_R)
                mdy = jnp.repeat(_pkmean(fly), PACKET_R)
                mdz = jnp.repeat(_pkmean(flz), PACKET_R)
                # fully-masked packets: any nonzero dir keeps idir finite
                mlen = mdx * mdx + mdy * mdy + mdz * mdz
                mdz = jnp.where(mlen < 1e-12, 1.0, mdz)
                sdx = jnp.where(mask, flx, mdx)
                sdy = jnp.where(mask, fly, mdy)
                sdz = jnp.where(mask, flz, mdz)
            else:
                sdx, sdy, sdz = flx, fly, flz
            # binary visibility is piecewise-constant: the any-hit kernel
            # always runs on stop-gradient'ed inputs (no Pallas AD rule
            # needed, and d(blocked)/d(anything) == 0 anyway)
            if any_hit is not None:
                blocked = any_hit(lp, (sdx, sdy, sdz), stm)
            elif stats_out is not None:
                from ..ops.traverse_pallas import any_hit_shared_stats

                blocked, st = any_hit_shared_stats(
                    sg(scene), sg(lp), (sg(sdx), sg(sdy), sg(sdz)), sg(stm)
                )
                stats_out.append(st)
            else:
                blocked = any_hit_shared(
                    sg(scene), sg(lp), (sg(sdx), sg(sdy), sg(sdz)), sg(stm)
                )
            lit = mask & ~blocked
        else:
            lit = mask
        at = ldist * (1.0 / lights.radius[i])
        atten = jnp.maximum(
            0.0, (1.0 - at) * 0.2 + 1.0 / (16.0 * at * at) - 0.0625
        )
        dm = jnp.where(lit, dot * atten, 0.0)
        sm = dot * dot
        sm = sm * sm
        sm = sm * sm
        sm = sm * sm
        sm = jnp.where(lit, sm * atten, 0.0)
        lc = lights.color[i]
        ldr = ldr + lc[0] * dm
        ldg = ldg + lc[1] * dm
        ldb = ldb + lc[2] * dm
        lsr = lsr + lc[0] * sm
        lsg = lsg + lc[1] * sm
        lsb = lsb + lc[2] * sm

    # --- photon-map radiance (opt-in): the gathered irradiance joins
    # the diffuse light sum on the FAST lane too (the reference gathers
    # during shading in its compiled path, photons.cpp:68-195); same
    # dense-grid estimator as the portable integrator, pinned against
    # the kd oracle by tests/test_photon_render.py ---
    if opts.photons and photon_grid is not None:
        from .photons import gather_photons_grid

        pts = jnp.stack([px, py, pz], axis=-1)
        rad = gather_photons_grid(photon_grid, pts) * opts.photon_exposure
        ldr = ldr + jnp.where(hit, rad[..., 0], 0.0)
        ldg = ldg + jnp.where(hit, rad[..., 1], 0.0)
        ldb = ldb + jnp.where(hit, rad[..., 2], 0.0)

    sr = jnp.where(hit, ksr, 0.0)
    sg = jnp.where(hit, ksg, 0.0)
    sb = jnp.where(hit, ksb, 0.0)
    cr = jnp.where(hit, dr * ldr + sr * lsr, 0.0)
    cg = jnp.where(hit, dg * ldg + sg * lsg, 0.0)
    cb = jnp.where(hit, db * ldb + sb * lsb, 0.0)
    return cr, cg, cb


def _recompute_dist_bary_c(scene, o3, d3, tri, hit):
    """Differentiable closed-form (dist, u, v) recompute for known hit ids,
    component-planar (the snail_tpu/diff/vjp.py recompute in the packed
    layout): ONE (T, 9) row gather + ~40 VPU flops per ray.

    A TPU gather costs ~7.4 ms per 1M rows REGARDLESS of row width
    (measured: (T,3) == (T,32) == 7.4 ms; 1-D is worse), so the three
    tri tables are concatenated into one primal row first — the concat
    is differentiable (VJP = slicing), so tri_a/ba/ca grads still flow."""
    st = jnp.where(hit, tri, 0)
    packed = jnp.concatenate(
        [scene.tri_a, scene.tri_ba, scene.tri_ca], axis=1)
    row = _gather_cols(packed, st)  # (9, R)
    return _recompute_from_rows(row, o3, d3)


def _recompute_from_rows(row, o3, d3):
    """(dist, u, v) from pre-gathered primal [a|ba|ca] (9, R) columns."""
    a = (row[0], row[1], row[2])
    ba = (row[3], row[4], row[5])
    ca = (row[6], row[7], row[8])
    nx = ba[1] * ca[2] - ba[2] * ca[1]
    ny = ba[2] * ca[0] - ba[0] * ca[2]
    nz = ba[0] * ca[1] - ba[1] * ca[0]
    tvx = o3[0] - a[0]
    tvy = o3[1] - a[1]
    tvz = o3[2] - a[2]
    dx, dy, dz = d3
    det = dx * nx + dy * ny + dz * nz
    idet = 1.0 / jnp.where(det == 0.0, 1e-30, det)
    c1x = tvy * ca[2] - tvz * ca[1]
    c1y = tvz * ca[0] - tvx * ca[2]
    c1z = tvx * ca[1] - tvy * ca[0]
    c2x = ba[1] * tvz - ba[2] * tvy
    c2y = ba[2] * tvx - ba[0] * tvz
    c2z = ba[0] * tvy - ba[1] * tvx
    u = (dx * c1x + dy * c1y + dz * c1z) * idet
    v = (dx * c2x + dy * c2y + dz * c2z) * idet
    dist = -(tvx * nx + tvy * ny + tvz * nz) * idet
    return dist, u, v


def _primary_dirs_planar(camera: Camera, width: int, height: int):
    """Differentiable primary-ray directions as flat (R,) components in
    the kernel's square-quadrant packet order (mirrors the in-kernel
    raygen _pixel_xy bit for bit; camera gradients flow here)."""
    tiles_x = width // TILE
    p = tiles_x * (height // TILE)
    pid = jnp.arange(p, dtype=jnp.int32)
    k = jnp.arange(TILE * TILE, dtype=jnp.int32)
    q, i = k >> 10, k & 1023
    pxk = ((q & (QX - 1)) << 5) + (i & 31)
    pyk = ((q >> (QX.bit_length() - 1)) << 5) + (i >> 5)
    px = ((pid % tiles_x)[:, None] * TILE + pxk[None, :]).astype(
        jnp.float32)
    py = ((pid // tiles_x)[:, None] * TILE + pyk[None, :]).astype(
        jnp.float32)
    x = (px + 0.5 - width * 0.5) * jnp.float32(1.0 / height)
    y = (height * 0.5 - py - 0.5) * jnp.float32(1.0 / height)
    f = camera.front * camera.plane_dist
    dx = camera.right[0] * x + camera.up[0] * y + f[0]
    dy = camera.right[1] * x + camera.up[1] * y + f[1]
    dz = camera.right[2] * x + camera.up[2] * y + f[2]
    inv_len = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    return ((dx * inv_len).reshape(-1), (dy * inv_len).reshape(-1),
            (dz * inv_len).reshape(-1))


def _diff_pack(scene):
    """(T, 42) combined row: sh_pack (static) | tri_a | tri_ba | tri_ca
    (primal) | mat id — the diff path's single per-wavefront gather. The
    concat is differentiable (VJP = slicing), so vertex grads flow; the
    mat id rides as f32 (exact below 2^24) so no second id gather."""
    return jnp.concatenate(
        [scene.sh_pack, scene.tri_a, scene.tri_ba, scene.tri_ca,
         scene.sh_mat.astype(jnp.float32)[:, None]], axis=1)


def _trace_and_shade(scene, o3, d3, tmax, opts, depth, diff=False):
    sg = jax.lax.stop_gradient
    if diff:
        sscene = sg(scene)
        dist, u, v, tri = closest_hit_c(
            sscene, tuple(sg(c) for c in o3), tuple(sg(c) for c in d3),
            sg(tmax),
        )
        hit = (dist > 0.0) & (dist < BIG)
        row = _gather_cols(_diff_pack(scene), jnp.where(hit, tri, 0))
        rd, ru, rv = _recompute_from_rows(row[32:41], o3, d3)
        dist = jnp.where(hit, rd, dist)
        u = jnp.where(hit, ru, u)
        v = jnp.where(hit, rv, v)
        sh_row = row
    else:
        dist, u, v, tri = closest_hit_c(scene, o3, d3, tmax)
        sh_row = None
    active = tmax >= 0.0
    dist = jnp.where(dist < jnp.minimum(tmax, BIG), dist, BIG)
    dist = jnp.where(active, dist, -BIG)
    return _shade_and_light(scene, o3, d3, dist, u, v, tri, opts, depth,
                            diff=diff, sh_row=sh_row)


@partial(jax.jit, static_argnames=("width", "height"))
def render_frame_fast(scene, camera: Camera, width: int, height: int,
                      opts: RenderOpts = RenderOpts(), photon_grid=None):
    """Full-frame packed Whitted render. Returns [H, W, 3] float32.

    Requires width/height multiples of TILE (64) and a pallas-packed
    scene. ``photon_grid`` + opts.photons adds the photon-map radiance
    term (same estimator as the portable integrator)."""
    dist, u, v, tri, dx, dy, dz = camera_trace(scene, camera, width, height)

    if not opts.shading:
        idist = jnp.where((dist > 0.0) & (dist < BIG), 1.0 / dist, 0.0)
        cr, cg, cb = idist * 20.0, idist * 250.0, idist * 2.0
    else:
        o3 = (camera.pos[0], camera.pos[1], camera.pos[2])
        cr, cg, cb = _shade_and_light(
            scene, o3, (dx, dy, dz), dist, u, v, tri, opts, 0,
            photon_grid=photon_grid,
        )

    return _packets_to_image(cr, cg, cb, width, height)


def stats_path_available(scene) -> bool:
    from ..ops.traverse_pallas import IVAL_LEAF, _wl_available

    # worklist scenes of ANY size have counter-instrumented kernels
    # (closing round-4's "stats path excludes paged scenes"); the walk
    # fallback keeps its flat-only stats variants
    return _wl_available(scene) or (
        scene.pk_meta is not None
        and scene.pg_meta is None
        and scene.leaf_max <= IVAL_LEAF
    )


def render_frame_fast_stats(scene, camera: Camera, width: int, height: int,
                            opts: RenderOpts = RenderOpts()):
    """render_frame_fast through the counter-instrumented kernel variants.

    Returns (img [H, W, 3], stats dict of REAL in-kernel measurements —
    the TreeStats rebuild, reference tree_stats.h:36-130 / GenInfo HUD):
      nodes        traversal loop iterations (nodes popped)
      leaves       leaves enqueued past the scalar interval culls
      quarters     (leaf, quarter) pairs intersected after per-ray culls
      tri_blocks   sum of leaf tri counts over processed quarters; one
                   unit = up to IVAL_LEAF tris tested against a
                   (QR, 128)-ray block
      chunks       walk sync chunks
      rays         rays traced (primary + per-light shadow wavefronts)
    Not jitted end-to-end (the reference also treats stats as a slow
    debug mode, tree_stats.h:12-33)."""
    from ..ops.traverse_pallas import camera_trace_stats

    dist, u, v, tri, dx, dy, dz, pstats = camera_trace_stats(
        scene, camera, width, height)
    stats_out = []
    o3 = (camera.pos[0], camera.pos[1], camera.pos[2])
    if not opts.shading:
        idist = jnp.where((dist > 0.0) & (dist < BIG), 1.0 / dist, 0.0)
        cr, cg, cb = idist * 20.0, idist * 250.0, idist * 2.0
    else:
        cr, cg, cb = _shade_and_light(
            scene, o3, (dx, dy, dz), dist, u, v, tri, opts, 0,
            stats_out=stats_out,
        )
    img = _packets_to_image(cr, cg, cb, width, height)

    import numpy as np

    tot = np.asarray(pstats, np.int64).sum(axis=0)
    for st in stats_out:
        tot = tot + np.asarray(st, np.int64).sum(axis=0)
    n_lights = 0 if scene.lights is None else scene.lights.pos.shape[0]
    stats = {
        "nodes": int(tot[0]),
        "leaves": int(tot[1]),
        "quarters": int(tot[2]),
        "tri_blocks": int(tot[3]),
        "chunks": int(tot[4]),
        "rays": width * height * (1 + (n_lights if opts.shadows else 0)),
    }
    return img, stats


@partial(jax.jit, static_argnames=("width", "height"))
def render_frame_fast_diff(scene, camera: Camera, width: int, height: int,
                           opts: RenderOpts = RenderOpts()):
    """Differentiable packed Whitted render. Returns [H, W, 3] float32.

    The fwd+bwd fast lane (BASELINE.json north-star metric): traversal
    topology comes from the same camera-fused Pallas kernel as
    :func:`render_frame_fast` (under stop_gradient — hit ids are
    piecewise-constant, snail_tpu/diff/vjp.py), the continuous outputs
    (dist, barycentrics) are recomputed in closed form from the primal
    triangle arrays, and shading runs in the same component-planar style
    with material colors gathered from the primal tables. Gradients flow
    to scene.tri_a/tri_ba/tri_ca, mat_diffuse/mat_specular, lights and
    the camera."""
    sg = jax.lax.stop_gradient
    dist0, _, _, tri, _, _, _ = camera_trace(sg(scene), sg(camera),
                                             width, height)
    # differentiable raygen in the SAME packet order as the kernel,
    # component-planar throughout — an AoS (R, 3) intermediate is
    # lane-padded to (R, 128) on TPU (~14 ms/Mray of layout traffic)
    dx, dy, dz = _primary_dirs_planar(camera, width, height)
    o3 = (camera.pos[0], camera.pos[1], camera.pos[2])

    hit = (dist0 > 0.0) & (dist0 < BIG)
    row = _gather_cols(_diff_pack(scene), jnp.where(hit, tri, 0))
    rd, ru, rv = _recompute_from_rows(row[32:41], o3, (dx, dy, dz))
    dist = jnp.where(hit, rd, sg(dist0))
    u = jnp.where(hit, ru, 0.0)
    v = jnp.where(hit, rv, 0.0)

    cr, cg, cb = _shade_and_light(
        scene, o3, (dx, dy, dz), dist, u, v, tri, opts, 0, diff=True,
        sh_row=row
    )
    img = _packets_to_image(cr, cg, cb, width, height)
    return img


def fast_path_available(scene, width: int, height: int) -> bool:
    return (
        (scene.pk_meta is not None or scene.wl_lfc is not None)
        and scene.sh_soa is not None
        and width % TILE == 0
        and height % TILE == 0
        and jax.default_backend() == "tpu"
        and scene.backend != "reference"
    )
