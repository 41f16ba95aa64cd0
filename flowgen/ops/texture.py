"""Texture sampling: bilinear gathers with wrap modes, randomized crops, and
affine backward warps.

TPU-native replacement for the reference's texture machinery:

* ``Texture::getRandomizedCrop`` — a CImg shift -> rotate -> center-crop(zoom)
  -> resize chain (src/caffe/DataGenerator.cpp:87-109). Here the whole chain
  composes into ONE affine and is applied as a single bilinear gather (one
  resampling instead of three, so slightly sharper output).
* ``getTransformedTexture`` — AGG full-frame backward warp with a bilinear
  span filter and reflect wrap (cpp:168-231).
* ``applyWarpFieldToTexture`` — per-pixel backward warp by an inverse flow
  field with zero boundary (cpp:237-252).

Textures are NHWC float32 in [0, 255].
"""

from __future__ import annotations

import jax.numpy as jnp

from . import affine


def _wrap_indices(i, n, mode):
    if mode == "reflect":
        # AGG wrap_mode_reflect: period 2n, second half mirrored
        # (agg_image_accessors.h). Index 0..n-1, n-1..0 repeating.
        period = 2 * n
        i = jnp.remainder(i, period)
        return jnp.where(i >= n, period - 1 - i, i)
    if mode == "clamp":
        return jnp.clip(i, 0, n - 1)
    if mode == "zero":  # handled by caller via validity mask; clamp for safety
        return jnp.clip(i, 0, n - 1)
    raise ValueError(f"unknown wrap mode {mode}")


def sample_bilinear(img, x, y, wrap="reflect"):
    """Bilinear sample ``img`` (H, W, C) at float coords (x, y), pixel centers
    at integers (CImg linear_atXY convention, used by the reference for all
    warps). ``wrap``: 'reflect' | 'clamp' | 'zero'.

    Returns an array shaped like x with a trailing channel axis.
    """
    h, w = img.shape[0], img.shape[1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    xi0 = _wrap_indices(x0, w, wrap)
    xi1 = _wrap_indices(x0 + 1, w, wrap)
    yi0 = _wrap_indices(y0, h, wrap)
    yi1 = _wrap_indices(y0 + 1, h, wrap)

    flat = img.reshape(h * w, -1)

    def tap(yi, xi):
        return jnp.take(flat, yi * w + xi, axis=0)

    v00 = tap(yi0, xi0)
    v01 = tap(yi0, xi1)
    v10 = tap(yi1, xi0)
    v11 = tap(yi1, xi1)
    top = v00 + (v01 - v00) * fx
    bot = v10 + (v11 - v10) * fx
    out = top + (bot - top) * fy

    if wrap == "zero":
        ok = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
        out = jnp.where(ok[..., None], out, 0.0)
    return out


def make_quad(img):
    """Pack each pixel's 2x2 bilinear footprint into one row: (H, W, C) ->
    (H, W, 4C) with [p00 | p01 | p10 | p11] along the channel axis (edge
    neighbors clamped, which coincides with reflect at the boundary).

    TPU gathers cost per *row* fetched, not per element, so packing the whole
    footprint makes bilinear sampling one gather instead of four — the
    difference between ~5 ms and ~1.5 ms per 512x384 resample on v5e.
    """
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    down = jnp.concatenate([img[1:], img[-1:]], axis=0)
    downright = jnp.concatenate([right[1:], right[-1:]], axis=0)
    return jnp.concatenate([img, right, down, downright], axis=-1)


def sample_bilinear_quad(quad, x, y, wrap="reflect", channels=3):
    """Bilinear sample from a quad-packed table (see make_quad): ONE gather
    per sample point. Matches :func:`sample_bilinear` exactly — reflect wrap
    pre-folds the CONTINUOUS coordinate (see :func:`_reflect_fold_coord`), so
    mirrored regions interpolate in the true (flipped) neighbor direction."""
    h, w = quad.shape[0], quad.shape[1]
    return sample_bilinear_quad_flat(
        quad.reshape(h * w, 4 * channels), jnp.int32(0), h, w, x, y,
        wrap=wrap, channels=channels,
    )


def _reflect_fold_coord(x, n):
    """Fold a continuous sample coordinate into the source range under AGG
    reflect wrap so that in-range bilinear (with edge-clamped +1 neighbors,
    make_quad) reproduces reflect-bilinear EXACTLY.

    The mirror planes of index-reflect (i -> 2n-1-i) sit at texel edges
    (x = -0.5 and x = n-0.5), so the continuous fold is
    ``u = (x + 0.5) mod 2n; xr = u - 0.5 if u < n else (2n - u) - 0.5``.
    In-range coordinates pass through UNTOUCHED (bit-identical to the
    unfolded path — the +0.5/-0.5 round trip is only applied out of range);
    the result is clipped to [0, n-1], where the clip reproduces the
    boundary coincidence fold(n) = n-1 and fold(-1) = 0."""
    period = 2.0 * n
    u = jnp.remainder(x + 0.5, period)
    xr = jnp.where(u < n, u - 0.5, (period - u) - 0.5)
    in_range = (x >= 0) & (x <= n - 1)
    return jnp.where(in_range, x, jnp.clip(xr, 0.0, n - 1.0))


def sample_bilinear_quad_flat(flat, base, h, w, x, y, wrap="reflect",
                              channels=3):
    """:func:`sample_bilinear_quad` against one texture of a STACKED quad
    table flattened to (T*h*w, 4c), selected by row offset ``base`` (=
    tex_id * h * w). Folding the texture id into the gather indices instead
    of slicing the atlas first is what keeps a vmapped caller cheap: indexing
    a stacked atlas with per-sample traced ids under vmap would gather and
    materialize the full texture for every sample (~300 MB/batch observed)."""
    if wrap == "reflect":
        # Exact reflect: fold the continuous coordinates, then sample with
        # clamp indexing (the quad rows' edge-clamped +1 neighbors coincide
        # with reflect at the boundary, so the folded in-range sample is the
        # true reflect-bilinear value).
        x = _reflect_fold_coord(x, w)
        y = _reflect_fold_coord(y, h)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    clamp_wrap = "clamp" if wrap == "reflect" else wrap
    xi = _wrap_indices(x0f.astype(jnp.int32), w, clamp_wrap)
    yi = _wrap_indices(y0f.astype(jnp.int32), h, clamp_wrap)

    rows = jnp.take(flat, base + yi * w + xi, axis=0).astype(jnp.float32)
    p00 = rows[..., 0 * channels : 1 * channels]
    p01 = rows[..., 1 * channels : 2 * channels]
    p10 = rows[..., 2 * channels : 3 * channels]
    p11 = rows[..., 3 * channels : 4 * channels]
    top = p00 + (p01 - p00) * fx
    bot = p10 + (p11 - p10) * fx
    out = top + (bot - top) * fy
    if wrap == "zero":
        ok = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
        out = jnp.where(ok[..., None], out, 0.0)
    return out


def affine_warp(img, transform, px, py, wrap="reflect"):
    """Backward warp: out(p) = img(transform^-1 (p)) — getTransformedTexture
    (cpp:203-206 inverts the matrix for dest->src mapping)."""
    inv = affine.invert(transform)
    sx, sy = affine.apply_xy(inv, px, py)
    return sample_bilinear(img, sx, sy, wrap=wrap)


def randomized_crop_transform(src_h, src_w, out_h, out_w, angle_deg, zoom, shift_x, shift_y):
    """The output->source affine of Texture::getRandomizedCrop (cpp:87-109).

    The CImg chain (output pixel -> source pixel, read right-to-left):
      1. resize (out_w, out_h) <- crop box of size (out_w/zoom, out_h/zoom)
         anchored at the *centered crop start* (sw/2 - out_w/2, sh/2 - out_h/2)
         — note the box is anchored, not centered, for zoom != 1 (cpp:99-102);
      2. rotation by ``angle_deg`` DEGREES about the image center (CImg
         ``rotate`` takes degrees; the reference samples this value in radians
         and passes it straight through — a quirk we reproduce);
      3. integer shift by (shift_x, shift_y): get_shift moves content by +s,
         so source coords shift by -s.
    """
    # resize: out pixel x -> crop coord x * (box_w / out_w)
    box_w = out_w / zoom
    box_h = out_h / zoom
    scale = jnp.stack(
        [
            jnp.stack([box_w / out_w, jnp.zeros_like(zoom), jnp.zeros_like(zoom)], -1),
            jnp.stack([jnp.zeros_like(zoom), box_h / out_h, jnp.zeros_like(zoom)], -1),
        ],
        -2,
    )
    crop_origin = affine.translation(src_w / 2.0 - out_w / 2.0, src_h / 2.0 - out_h / 2.0)
    # CImg rotate keeps the same size and rotates content by +angle about the
    # center; source coord = R(-angle) about center of target coord. As an
    # output->source map we rotate by +angle? CImg rotates the *image* CCW for
    # positive angles: dest(p) = src(R(+a)(p - c) + c) in CImg's convention
    # (rot2d uses cos/sin on destination coords). We therefore apply R(angle).
    ang = angle_deg * (jnp.pi / 180.0)
    cx = src_w / 2.0
    cy = src_h / 2.0
    rot = affine.conjugate_about(affine.rotation(ang), cx, cy)
    unshift = affine.translation(-shift_x, -shift_y)
    # Chain: out -> scale+crop -> rotate-space -> shift-space (= source).
    return affine.chain(scale, crop_origin, rot, unshift)


def randomized_crop_transform_native(
    src_h, src_w, out_h, out_w, angle_deg, zoom, shift_x, shift_y
):
    """Per-source crop transform with the reference's small-source fallback
    (Texture::getRandomizedCrop, cpp:96-108): sources at least as large as
    the request use the shift->rotate->crop->resize chain; smaller sources
    shift->rotate->resize the WHOLE image (zoom ignored). ``src_h``/``src_w``
    may be traced per-sample values — everything is jnp math, so the two
    chains select elementwise."""
    crop_t = randomized_crop_transform(
        src_h, src_w, out_h, out_w, angle_deg, zoom, shift_x, shift_y
    )
    zoom = jnp.asarray(zoom, jnp.float32)
    sx = src_w / out_w
    sy = src_h / out_h
    z = jnp.zeros_like(zoom)
    scale = jnp.stack(
        [
            jnp.stack([sx + z, z, z], -1),
            jnp.stack([z, sy + z, z], -1),
        ],
        -2,
    )
    ang = angle_deg * (jnp.pi / 180.0)
    rot = affine.conjugate_about(
        affine.rotation(ang), src_w / 2.0, src_h / 2.0
    )
    unshift = affine.translation(-shift_x, -shift_y)
    resize_t = affine.chain(scale, rot, unshift)
    big_enough = (src_w >= out_w) & (src_h >= out_h)
    return jnp.where(big_enough, crop_t, resize_t)


def randomized_crop(src, out_h, out_w, angle_deg, zoom, shift_x, shift_y):
    """One-gather equivalent of Texture::getRandomizedCrop for sources at least
    as large as the output (the reference's resize-only fallback for smaller
    sources is handled at atlas-build time, where all sources are normalized)."""
    t = randomized_crop_transform(
        src.shape[0], src.shape[1], out_h, out_w, angle_deg, zoom, shift_x, shift_y
    )
    yy, xx = jnp.meshgrid(
        jnp.arange(out_h, dtype=jnp.float32), jnp.arange(out_w, dtype=jnp.float32),
        indexing="ij",
    )
    sx, sy = affine.apply_xy(t, xx, yy)
    return sample_bilinear(src, sx, sy, wrap="reflect")


def warp_by_flow(img, iflow, wrap="zero"):
    """applyWarpFieldToTexture (cpp:237-252): out(x,y) = img(x + iflow_x,
    y + iflow_y), zero outside. ``iflow``: (H, W, 2); NaN flow entries (see
    warpfields/compose.py) sample as zero displacement."""
    h, w = img.shape[0], img.shape[1]
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    dx = jnp.nan_to_num(iflow[..., 0])
    dy = jnp.nan_to_num(iflow[..., 1])
    return sample_bilinear(img, xx + dx, yy + dy, wrap=wrap)
