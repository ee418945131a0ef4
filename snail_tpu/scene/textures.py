"""Mipmapped textures on device.

Rebuild of ``MipmapTexture`` + ``PointSampler``
(reference src/mipmap_texture.{h,cpp}, src/sampling/point_sampler.cpp):

- power-of-2 RGB textures with a full mip chain (box-filtered GenMips,
  mipmap_texture.cpp);
- point sampling with wrap addressing and the reference's vertical flip
  (point_sampler.cpp:79-80);
- mip level selected from the uv footprint: ``pixels = floor(min(diff.x*w,
  diff.y*h))``, mip = position of highest set bit + 1, clamped to the chain
  (point_sampler.cpp:97-108).

Device layout: all textures share one **pyramid atlas** ``[NT, 2H, W, 3]``
(float32) — mip L of a texture lives at row offset ``2H * (1 - 2^-L)``, the
classic vertically-stacked pyramid, so one gather fetches any texel of any
mip of any texture. ``meta[NT, 4] = (w, h, n_mips, 0)``. Smaller textures
are upsampled to the common base size at load (area-preserving repeat), so
w/h are uniform; per-texture true sizes stay in meta for footprint math.

The SAT (summed-area table) sampler of the reference
(src/sampling/sat_sampler.h) is represented by :func:`build_sat` /
:func:`sample_sat` for box-filtered lookups with arbitrary footprints.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _is_pow2(x: int) -> bool:
    return x > 0 and (x & (x - 1)) == 0


def gen_mips(img: np.ndarray) -> List[np.ndarray]:
    """Box-filter mip chain down to 1x1 (reference MipmapTexture::GenMips)."""
    assert _is_pow2(img.shape[0]) and _is_pow2(img.shape[1]), img.shape
    mips = [img.astype(np.float32)]
    cur = mips[0]
    while cur.shape[0] > 1 or cur.shape[1] > 1:
        h = max(cur.shape[0] // 2, 1)
        w = max(cur.shape[1] // 2, 1)
        if cur.shape[0] > 1 and cur.shape[1] > 1:
            nxt = (
                cur[0::2, 0::2] + cur[1::2, 0::2] + cur[0::2, 1::2] + cur[1::2, 1::2]
            ) * 0.25
        elif cur.shape[0] > 1:
            nxt = (cur[0::2] + cur[1::2]) * 0.5
        else:
            nxt = (cur[:, 0::2] + cur[:, 1::2]) * 0.5
        mips.append(nxt.astype(np.float32))
        cur = nxt
    return mips


def build_pyramid_atlas(images: List[np.ndarray]):
    """Pack images (each [h, w, 3], power-of-2) into the pyramid atlas.

    Returns (atlas float32[NT, 2H, W, 3], meta int32[NT, 4]).
    """
    assert images
    base_h = max(i.shape[0] for i in images)
    base_w = max(i.shape[1] for i in images)
    nt = len(images)
    atlas = np.zeros((nt, 2 * base_h, base_w, 3), np.float32)
    meta = np.zeros((nt, 4), np.int32)
    for t, img in enumerate(images):
        # upsample to common base size (nearest repeat keeps texel identity)
        ry = base_h // img.shape[0]
        rx = base_w // img.shape[1]
        up = np.repeat(np.repeat(img, ry, axis=0), rx, axis=1)
        mips = gen_mips(up)
        off = 0
        for lvl, m in enumerate(mips):
            atlas[t, off : off + m.shape[0], : m.shape[1]] = m
            off += m.shape[0]
        meta[t] = (base_w, base_h, len(mips), 0)
    return jnp.asarray(atlas), jnp.asarray(meta)


def mip_from_footprint(diff_uv, w, h, n_mips):
    """Reference mip rule (point_sampler.cpp:97-108): pixels =
    floor(min(diff.x*w, diff.y*h)); mip = bit-length of pixels."""
    px = jnp.minimum(diff_uv[..., 0] * w, diff_uv[..., 1] * h)
    px = jnp.maximum(px, 0.0)
    ip = jnp.floor(px).astype(jnp.int32)
    # bit length: floor(log2(ip)) + 1 for ip >= 1
    mip = jnp.where(
        ip > 0,
        jnp.floor(jnp.log2(jnp.maximum(ip.astype(jnp.float32), 1.0))).astype(
            jnp.int32
        )
        + 1,
        0,
    )
    return jnp.clip(mip, 0, n_mips - 1)


def uv_footprint(uv, tile_hw, valid):
    """Per-pixel uv footprint from tile-ordered wavefront uvs — the
    ``texDiff`` of the reference (scene_inl.h:294: per-2x2-block uv delta
    feeding PointSampler's mip pick, point_sampler.cpp:97-108), computed
    here as masked forward differences over each tile.

    uv float32[R, 2] in row-major (tile_h, tile_w) tile packet order,
    valid bool[R] (misses/foreign pixels contribute no footprint).
    Returns float32[R, 2].
    """
    th, tw = tile_hw
    q = uv.reshape(-1, th, tw, 2)
    vq = valid.reshape(-1, th, tw)

    def fd(axis):
        d = jnp.abs(jnp.diff(q, axis=axis))
        if axis == 1:
            ok = (vq[:, 1:, :] & vq[:, :-1, :])[..., None]
            pad = ((0, 0), (0, 1), (0, 0), (0, 0))
        else:
            ok = (vq[:, :, 1:] & vq[:, :, :-1])[..., None]
            pad = ((0, 0), (0, 0), (0, 1), (0, 0))
        return jnp.pad(jnp.where(ok, d, 0.0), pad, mode="edge")

    return jnp.maximum(fd(1), fd(2)).reshape(-1, 2)


def sample_atlas(atlas, meta, tex_id, uv, diff_uv=None, filter="point"):
    """Sample the pyramid atlas.

    tex_id int32[...] (-1 allowed: result meaningless, caller masks),
    uv float32[..., 2], diff_uv optional float32[..., 2] uv footprint,
    filter "point" (PointSampler, sampling/point_sampler.cpp:52-100) or
    "bilinear" (BilinearSampler, sampling/bilinear_sampler.*: 4 taps at
    the selected mip, fractional weights, wrap addressing).
    Returns rgb float32[..., 3] in [0, 1].
    """
    tid = jnp.maximum(tex_id, 0)
    m = jnp.take(meta, tid, axis=0)
    w = m[..., 0]
    h = m[..., 1]
    n_mips = m[..., 2]
    base_h = atlas.shape[1] // 2

    if diff_uv is not None:
        mip = mip_from_footprint(diff_uv, w.astype(jnp.float32),
                                 h.astype(jnp.float32), n_mips)
    else:
        mip = jnp.zeros_like(w)

    wm = jnp.right_shift(w, mip)  # mip-level extent (pow2)
    hm = jnp.right_shift(h, mip)
    row0 = 2 * base_h - jnp.right_shift(2 * base_h, mip)  # pyramid offset

    def tap(xi, yi):
        xi = xi & (wm - 1)  # wrap addressing (point_sampler.cpp:72-76)
        yi = yi & (hm - 1)
        yi = hm - 1 - yi  # vertical flip (point_sampler.cpp:79-80)
        return atlas[tid, row0 + yi, xi]

    if filter == "point":
        # integer texel coords at mip 0, shifted down
        # (point_sampler.cpp:110-116)
        x = (uv[..., 0] * w.astype(jnp.float32)).astype(jnp.int32)
        y = (uv[..., 1] * h.astype(jnp.float32)).astype(jnp.int32)
        return tap(jnp.right_shift(x, mip), jnp.right_shift(y, mip))

    # bilinear: fractional coords at the SELECTED mip, 4 taps
    xf = uv[..., 0] * wm.astype(jnp.float32) - 0.5
    yf = uv[..., 1] * hm.astype(jnp.float32) - 0.5
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    fx = (xf - x0)[..., None]
    fy = (yf - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    c00 = tap(x0, y0)
    c10 = tap(x0 + 1, y0)
    c01 = tap(x0, y0 + 1)
    c11 = tap(x0 + 1, y0 + 1)
    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def build_sat(img: np.ndarray) -> np.ndarray:
    """Summed-area table (reference SATSampler, sampling/sat_sampler.h:10-57)."""
    return np.cumsum(np.cumsum(img.astype(np.float64), axis=0), axis=1)


def build_sat_atlas(atlas, meta) -> "jnp.ndarray":
    """Per-texture SATs over the mip-0 plane of a pyramid atlas
    ([T, 2H, W, 3] -> f32 [T, H, W, 3]). Pairs with a pyramid atlas so a
    scene can offer both samplers (NewSampler picks per format,
    sampling/sampler.cpp:9-44; here RenderOpts.tex_filter picks)."""
    import numpy as _np

    a = _np.asarray(atlas, _np.float64)
    base_h = a.shape[1] // 2
    sats = _np.cumsum(_np.cumsum(a[:, :base_h], axis=1), axis=2)
    return jnp.asarray(sats, jnp.float32)


def _sat_axis_segments(c, hw, n, full):
    """Wrap-aware texel interval [c-hw, c+hw] on an n-texel (pow2) axis.

    Returns two inclusive segments (a0, a1) and (b0, b1); the second is
    empty (b1 < b0) unless the interval straddles the wrap seam — the
    reference SATSampler wraps its rect coords the same way
    (sat_sampler.cpp:56-80). ``full`` forces the whole axis (the
    reference's size >= 0.5 average fallback, sat_sampler.cpp:52)."""
    i0 = jnp.floor((c - hw) * n.astype(jnp.float32)).astype(jnp.int32)
    i1 = jnp.floor((c + hw) * n.astype(jnp.float32)).astype(jnp.int32)
    whole = full | ((i1 - i0 + 1) >= n)
    m0 = jnp.where(whole, 0, i0 & (n - 1))  # pow2 wrap (wMask/hMask)
    m1 = jnp.where(whole, n - 1, i1 & (n - 1))
    wrapped = m0 > m1
    a1 = jnp.where(wrapped, n - 1, m1)
    b1 = jnp.where(wrapped, m1, -1)  # empty when not wrapped
    return m0, a1, jnp.zeros_like(m0), b1


def sample_sat_atlas(sat_atlas, meta, tex_id, uv, diff_uv):
    """Box-filtered fetch over the uv footprint via SAT rect sums
    (SATSampler::operator(), sat_sampler.cpp:51-86) — the large-footprint
    complement to mip point/bilinear sampling.

    Wrap addressing: a footprint straddling the [0,1) seam splits into
    per-axis segments (up to 2x2 rect queries) and averages across the
    seam exactly, matching the reference's wrapped-rect intent (its
    two-rect combination under-counts the double-wrap corner; the exact
    product form here does not). The vertical flip happens in TEXEL space
    ((h-1) - y, like the point/bilinear taps) so all three samplers
    agree on orientation."""
    tid = jnp.maximum(tex_id, 0)
    m = jnp.take(meta, tid, axis=0)
    wi = m[..., 0]
    hi = m[..., 1]
    size_u = jnp.maximum(diff_uv[..., 0], 1e-6)
    size_v = jnp.maximum(diff_uv[..., 1], 1e-6)
    # reference: either-axis footprint >= half the texture -> whole-texture
    # average (sat_sampler.cpp:52)
    full = (size_u >= 0.5) | (size_v >= 0.5)
    cu = uv[..., 0] - jnp.floor(uv[..., 0])
    cv = uv[..., 1] - jnp.floor(uv[..., 1])

    ua0, ua1, ub0, ub1 = _sat_axis_segments(cu, 0.5 * size_u, wi, full)
    va0, va1, vb0, vb1 = _sat_axis_segments(cv, 0.5 * size_v, hi, full)
    # texture-v segment [a, b] -> SAT rows [h-1-b, h-1-a] (texel flip)
    fva0, fva1 = hi - 1 - va1, hi - 1 - va0
    fvb0, fvb1 = hi - 1 - vb1, hi - 1 - vb0

    s = sat_atlas

    def t(yy, xx, on):
        v = s[tid, yy, xx]
        return jnp.where(on[..., None], v, 0.0)

    def rect(y0, y1, x0, x1):
        """Inclusive SAT rect sum; empty (x1<x0 or y1<y0) -> 0."""
        on = (x1 >= x0) & (y1 >= y0)
        y0c = jnp.clip(y0, 0, None)
        x0c = jnp.clip(x0, 0, None)
        total = (
            t(y1, x1, on)
            - t(jnp.maximum(y0c - 1, 0), x1, on & (y0c > 0))
            - t(y1, jnp.maximum(x0c - 1, 0), on & (x0c > 0))
            + t(jnp.maximum(y0c - 1, 0), jnp.maximum(x0c - 1, 0),
                on & (x0c > 0) & (y0c > 0))
        )
        return total

    total = (
        rect(fva0, fva1, ua0, ua1) + rect(fva0, fva1, ub0, ub1)
        + rect(fvb0, fvb1, ua0, ua1) + rect(fvb0, fvb1, ub0, ub1)
    )
    nu = (jnp.maximum(ua1 - ua0 + 1, 0) + jnp.maximum(ub1 - ub0 + 1, 0))
    nv = (jnp.maximum(va1 - va0 + 1, 0) + jnp.maximum(vb1 - vb0 + 1, 0))
    area = (nu * nv).astype(jnp.float32)
    return total / area[..., None]


def sample_sat(sat, uv_min, uv_max):
    """Mean color over an axis-aligned uv rect via 4 SAT taps."""
    h, w = sat.shape[:2]
    x0 = jnp.clip((uv_min[..., 0] * w).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip((uv_max[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip((uv_min[..., 1] * h).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip((uv_max[..., 1] * h).astype(jnp.int32), 0, h - 1)
    x1 = jnp.maximum(x1, x0)
    y1 = jnp.maximum(y1, y0)
    s = jnp.asarray(sat)
    total = (
        s[y1, x1]
        - jnp.where((y0 > 0)[..., None], s[jnp.maximum(y0 - 1, 0), x1], 0.0)
        - jnp.where((x0 > 0)[..., None], s[y1, jnp.maximum(x0 - 1, 0)], 0.0)
        + jnp.where(
            ((x0 > 0) & (y0 > 0))[..., None],
            s[jnp.maximum(y0 - 1, 0), jnp.maximum(x0 - 1, 0)],
            0.0,
        )
    )
    area = ((x1 - x0 + 1) * (y1 - y0 + 1)).astype(jnp.float32)
    return (total / area[..., None]).astype(jnp.float32)


def checker_atlas(scene, size: int = 256, squares: int = 16):
    """Attach a procedural checkerboard texture to every material of an
    existing TracedScene (for textured-throughput benchmarking when the
    reference scene ships no image files — the reference's headline row is
    sponza WITH textures, benchmark.txt:91-94).

    Returns a new scene with tex_atlas/tex_meta set and every material's
    diffuse_tex id pointing at texture 0, in all three material encodings
    (mat_difftex, mat_pack, the denormalized sh_pack row). The reference
    scenes ship no ``vt`` records, so planar world-space UVs are
    synthesized from the triangle vertices (XZ projection over the scene
    extent) — exercising the real gather/mip path with varying texels."""
    import dataclasses

    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    cell = size // squares
    chk = ((yy // cell + xx // cell) % 2).astype(np.float32)
    img = np.stack([0.2 + 0.7 * chk, 0.25 + 0.5 * chk, 0.3 + 0.3 * chk],
                   axis=-1)
    atlas, meta = build_pyramid_atlas([img])

    lo, hi = scene.node_lo[0], scene.node_hi[0]
    inv = 4.0 / jnp.maximum(jnp.max(hi - lo), 1e-6)  # ~4 tex repeats
    uv0 = (scene.tri_a[:, (0, 2)] - lo[None, (0, 2)]) * inv
    uve1 = scene.tri_ba[:, (0, 2)] * inv
    uve2 = scene.tri_ca[:, (0, 2)] * inv

    mat_difftex = jnp.zeros_like(scene.mat_difftex)
    mat_pack = scene.mat_pack.at[:, 8].set(0.0)
    sh_pack = scene.sh_pack.at[:, 24].set(0.0)  # denormalized difftex col
    t = scene.sh_pack.shape[0]
    sh_pack = sh_pack.at[:, 9:11].set(uv0[:t])
    sh_pack = sh_pack.at[:, 11:13].set(uve1[:t])
    sh_pack = sh_pack.at[:, 13:15].set(uve2[:t])
    return dataclasses.replace(
        scene,
        tex_atlas=atlas,
        tex_meta=meta,
        mat_difftex=mat_difftex,
        mat_pack=mat_pack,
        sh_pack=sh_pack,
        sh_uv0=uv0,
        sh_uve1=uve1,
        sh_uve2=uve2,
    )


def load_texture_atlas(descs, tex_dir: str):
    """Load the diffuse/dissolve maps referenced by material descs
    (reference LoadTextures, shading/material.cpp:150-166; bmp/tga/png).
    Returns ((atlas, meta), name->tex_id) or (None, {}) if none load."""
    import os

    names: List[str] = []
    for d in descs:
        for n in (d.diffuse_map, d.dissolve_map):
            if n and n not in names:
                names.append(n)
    images = []
    ids: Dict[str, int] = {}
    for n in names:
        path = os.path.join(tex_dir, n)
        img = _load_image_pow2(path)
        if img is None:
            continue
        ids[n] = len(images)
        images.append(img)
    if not images:
        return None, {}
    return build_pyramid_atlas(images), ids


def _load_image_pow2(path):
    """Load an image as float32 [h, w, 3] in [0,1], padded/cropped to
    power-of-2 (the reference FATALs on non-pow2, point_sampler.cpp:7-8;
    we resize instead)."""
    import os

    if not os.path.exists(path):
        return None
    try:
        from PIL import Image  # pillow ships with the baked-in deps

        img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    except Exception:
        return None
    h, w = img.shape[:2]
    ph = 1 << (h - 1).bit_length()
    pw = 1 << (w - 1).bit_length()
    if (ph, pw) != (h, w):
        ys = (np.arange(ph) * h // ph).clip(0, h - 1)
        xs = (np.arange(pw) * w // pw).clip(0, w - 1)
        img = img[ys][:, xs]
    return img
