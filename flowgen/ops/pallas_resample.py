"""Banded two-pass affine resampling in Mosaic — the TPU answer to AGG's
``span_image_filter_rgb_bilinear`` full-frame warps (reference:
src/caffe/DataGenerator.cpp:168-231) and the CImg crop/rotate/resize chain
(cpp:87-109).

Why not XLA gathers: TPU gathers fetch one row per index at a hardware row
rate (~250M rows/s measured on v5e), making every 512x384 bilinear resample
cost ~1.5 ms and leaving the generator gather-bound. Mosaic's
``tpu.dynamic_gather`` is restricted to a single vreg along the gather
dimension (8 sublanes / 128 lanes), so arbitrary gathers are impossible — but
an AFFINE warp has structure: decompose it into two 1-D passes whose sampling
positions move linearly, and every gather lands within a handful of 128-lane
tiles that a short static loop covers at vector speed.

Rotations beyond the |rot| < 45 deg conditioning bound (modes 11/13 reach
±123 deg total) are factored as quadrant ∘ residual on the XLA side
(compose/fused.py): the 90-deg part becomes a rot90 slab copy + affine
coordinate swap, the 180-deg part is FREE — the reflect-wrap extension is
invariant under the point reflection p -> -1-p, which flips the linear part
by R(180) without changing a single sampled value — and the residual always
lands in [-45, 45] deg where this decomposition is well-conditioned.

Decomposition (Catmull–Smith two-pass) for an output->source affine
``sx = a x + b y + e``, ``sy = c x + d y + f`` (coords at pixel centers =
integers, CImg convention):

  pass 1 (horizontal): t1[w, x] = row_lerp(slab[w0 + w], u*(x, w0 + w)),
      u* = A x + B w + C with A = a - b c / d, B = b / d, C = e - B f
  pass 2 (vertical):   out[y, x] = lerp(t1[v - w0], t1[v - w0 + 1], frac(v)),
      v = c x + d y + f

Pass 2 runs on the TRANSPOSED intermediate so its gathers are lane-wise too
(the rotation term |c|*width would otherwise span dozens of 8-row sublane
bands, and sublane gathers cannot cross a vreg). The result equals true
bilinear sampling exactly when b == 0 and otherwise interpolates along the
shear direction — a sub-level resampling deviation of the same order as the
reference's own multi-resample blur (see ROADMAP "Intentional fidelity
deviations"; the reference chain resamples every texture 2-3 times).

Slab format: RGB packed into one int32 per texel ((r<<16)|(g<<8)|b) so ONE
gather fetches all three channels, pre-padded with REFLECTED margins so wrap
handling inside the kernel is a clamp (:func:`pack_padded_slab`). |d| must
stay well above 0 (rotations < ~45 deg) — true for every background/object
motion envelope in the 13 modes; :func:`max_row_span` asserts it.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .detmath import det_lerp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Host-side slab preparation
# ---------------------------------------------------------------------------


def pack_rgb_i32(img):
    """(..., H, W, 3) uint8/float -> (..., H, W) int32 with (r<<16)|(g<<8)|b."""
    img = jnp.asarray(img)
    if img.dtype != jnp.uint8:
        img = jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)
    v = img.astype(jnp.int32)
    return (v[..., 0] << 16) | (v[..., 1] << 8) | v[..., 2]


def _reflect_indices(i, n):
    period = 2 * n
    i = jnp.remainder(i, period)
    return jnp.where(i >= n, period - 1 - i, i)


def reflect_pad(img, margin_y: int, margin_x: int):
    """Pad a (H, W) array with AGG ``wrap_mode_reflect`` content (period 2n,
    second half mirrored — matches texture._wrap_indices)."""
    h, w = img.shape[0], img.shape[1]
    yi = _reflect_indices(jnp.arange(-margin_y, h + margin_y), h)
    xi = _reflect_indices(jnp.arange(-margin_x, w + margin_x), w)
    return img[yi][:, xi]


def pack_padded_slab(img, margin_y: int, margin_x: int):
    """(H, W, 3) image -> reflect-padded RGB-packed int32 slab, shape-padded
    to (mult of 8, mult of 128) with edge-clamp rows/cols (never sampled: the
    kernel clamps positions to the reflected extent)."""
    slab = reflect_pad(pack_rgb_i32(img), margin_y, margin_x)
    h, w = slab.shape
    hp, wp = _round_up(h, 8), _round_up(w, 128)
    return jnp.pad(slab, ((0, hp - h), (0, wp - w)), mode="edge")


def two_pass_coeffs(transform):
    """Split an output->source affine (2, 3) into the two 1-D pass
    coefficient vectors: returns (A, B, C, c, d, f)."""
    a, b, e = transform[0, 0], transform[0, 1], transform[0, 2]
    c, d, f = transform[1, 0], transform[1, 1], transform[1, 2]
    B = b / d
    A = a - B * c
    C = e - B * f
    return A, B, C, c, d, f


def max_row_span(wh: int, ww: int, max_rot: float, max_scale: float) -> int:
    """Static bound on the source-row span of a (wh, ww) window (pass-1 row
    count), from a mode's motion envelope: |c| <= sin(max_rot)*max_scale,
    |d| <= max_scale. Asserts the decomposition stays well-conditioned."""
    assert max_rot <= math.pi / 4 + 1e-3, (
        "two-pass resampler needs |residual rot| <= 45 deg (larger rotations "
        "must be quadrant-factored first, see compose/fused._quadrant_factor)"
    )
    span = (
        math.sin(min(max_rot, math.pi / 4)) * max_scale * ww
        + max_scale * wh + 4
    )
    return _round_up(int(math.ceil(span)) + 8, 8)


PASS1_CHUNK = 128  # pass-1 row-chunk height: anchors the banded scan per
                   # chunk so the |B|*rows shear term stays one tile wide


def scan_tiles_pass1(A_max: float, B_max: float, rows: int) -> int:
    """Static lane-tile scan count for pass 1: u spans A*128 + |B|*rows + 2
    over one (rows, 128) x-tile block. Pass the pass-1 row-CHUNK height (the
    kernel re-anchors its scan window per chunk of ``PASS1_CHUNK`` rows, so
    ``rows=PASS1_CHUNK`` is tight; ``rows=P`` is valid but conservative)."""
    return int(math.ceil((A_max * 128 + B_max * rows + 3) / 128)) + 1


def scan_tiles_pass2(c_max: float, d_max: float, xchunk: int) -> int:
    """Static lane-tile scan count for pass 2 over a (xchunk, 128) block of
    the transposed intermediate: v spans |c|*xchunk + |d|*128 + 2."""
    return int(math.ceil((c_max * xchunk + d_max * 128 + 3) / 128)) + 1


# ---------------------------------------------------------------------------
# In-kernel primitives
# ---------------------------------------------------------------------------


def _unpack3(v):
    return (
        ((v >> 16) & 0xFF).astype(jnp.float32),
        ((v >> 8) & 0xFF).astype(jnp.float32),
        (v & 0xFF).astype(jnp.float32),
    )


def _banded_tap_pair(block_at, idx0, idx1, n_tiles_scan: int, zero,
                     n_src_tiles: int):
    """Gather two integer-tap columns per element from lane-tiled rows.

    ``block_at(base)`` must return the (R, 128) block of the source rows at
    column offset ``base`` (a traced multiple of 128). ``idx0``/``idx1``:
    (R, 128) int32 global column indices, all within ``n_tiles_scan`` tiles
    of the tile containing min(idx0). ``n_src_tiles``: source width / 128
    (keeps the scan in-bounds). Returns two (R, 128) taps."""
    n_tiles_scan = min(n_tiles_scan, n_src_tiles)
    tile0 = jnp.minimum(jnp.min(idx0) >> 7, n_src_tiles - n_tiles_scan)
    tile0 = jnp.maximum(tile0, 0)
    acc0 = zero
    acc1 = zero
    for k in range(n_tiles_scan):
        base = pl.multiple_of((tile0 + k) * 128, 128)
        part = block_at(base)
        o0 = idx0 - base
        o1 = idx1 - base
        g0 = jnp.take_along_axis(part, jnp.clip(o0, 0, 127), axis=1)
        g1 = jnp.take_along_axis(part, jnp.clip(o1, 0, 127), axis=1)
        acc0 = jnp.where((o0 >= 0) & (o0 < 128), g0, acc0)
        acc1 = jnp.where((o1 >= 0) & (o1 < 128), g1, acc1)
    return acc0, acc1


def _pass1_rows_needed(coeffs, w0f, x0, y0, wh: int, ww: int, P: int):
    """The actual source-row count pass 2 can read for THIS affine (pass 2's
    v is bounded by the same window corners): max corner v - w0 + floor/lerp
    slack, clamped to [1, P]. Out-of-envelope affines (v clamped at P-1 in
    pass 2) saturate at P — every chunk computes, the pre-predication
    behavior."""
    _, _, _, c, d, f = coeffs
    xs = (x0.astype(jnp.float32), x0.astype(jnp.float32) + (ww - 1))
    ys = (y0.astype(jnp.float32), y0.astype(jnp.float32) + (wh - 1))
    corners = [c * xx + d * yy + f for xx in xs for yy in ys]
    vmax = jnp.maximum(jnp.maximum(corners[0], corners[1]),
                       jnp.maximum(corners[2], corners[3]))
    return jnp.clip(vmax - w0f + 3.0, 1.0, float(P))


def pass1_row_start(coeffs, x0, y0, wh: int, ww: int, P: int, SH: int):
    """Pass-1 row-block start: source-v over the window corners, floor - 1,
    snapped to 8, clamped so [w0, w0+P) stays inside a height-``SH`` slab.
    Returns a traced int32 (provably a multiple of 8)."""
    _, _, _, c, d, f = coeffs
    xs = (x0.astype(jnp.float32), x0.astype(jnp.float32) + (ww - 1))
    ys = (y0.astype(jnp.float32), y0.astype(jnp.float32) + (wh - 1))
    corners = [c * xx + d * yy + f for xx in xs for yy in ys]
    vmin = jnp.minimum(jnp.minimum(corners[0], corners[1]),
                       jnp.minimum(corners[2], corners[3]))
    w0 = (jnp.floor(vmin).astype(jnp.int32) - 1) & ~7
    return pl.multiple_of(jnp.clip(w0, 0, (SH - P) & ~7), 8)


def resample_rows_in_kernel(
    rows_ref,          # VMEM (P, SWp) int32: slab rows [w0, w0+P) pre-staged
    w0,                # traced int32 row-block start (pass1_row_start)
    coeffs,            # (A, B, C, c, d, f) traced scalars, slab coords
    x0, y0,            # window origin in OUTPUT coords (traced scalars)
    wh: int, ww: int,  # static window size; ww mult of 128, wh mult of 8
    P: int,            # static pass-1 row count (max_row_span), mult of 8
    t1t_ref,           # VMEM scratch (3, ww, Pp) f32, Pp = round_up(P, 128)
    outt_ref,          # VMEM scratch (ww, round_up(wh, 128)) f32
    x_tiles_scan: int,  # scan_tiles_pass1(...)
    y_tiles_scan: int,  # scan_tiles_pass2(..., xchunk=128)
    sw: int = None,     # valid slab width (defaults to the full row width)
):
    """Two-pass affine resample of a window from pre-staged slab rows.
    ``coeffs`` map output coords to SLAB coords (caller folds the reflect
    margins in). Returns three (wh, ww) f32 channel planes. Callable from any
    kernel — the scene megakernel DMAs rows from HBM itself and calls this."""
    A, B, C, c, d, f = coeffs
    SWp = rows_ref.shape[1] if sw is None else sw
    Pp = t1t_ref.shape[2]
    XCHUNK = 128 if ww >= 128 else ww
    w0f = w0.astype(jnp.float32)
    rows_need = _pass1_rows_needed(coeffs, w0f, x0, y0, wh, ww, P)

    # ---- pass 1: t1t[ch, x, w] = row_lerp(slab[w0 + w], A x + B (w0+w) + C)
    # written TRANSPOSED per (RC, 128) block, so pass 2 consumes it directly
    # (the old separate full-matrix transpose re-read pass-1's whole output
    # per channel — pure VMEM traffic, now deleted). Row-chunked: each block
    # re-anchors its banded scan, so the shear drift |B|*rows only spans one
    # chunk (x_tiles_scan is sized for PASS1_CHUNK, not P). ``P`` is sized
    # for the mode's worst-case envelope; chunks past THIS affine's actual
    # source-row span (``rows_need``, the same corner bound pass 2's v obeys)
    # are predicated off — their t1t content is never read.
    for xt in range(ww // 128):
        for r0 in range(0, P, PASS1_CHUNK):
            rc = min(PASS1_CHUNK, P - r0)

            @pl.when(jnp.float32(r0) < rows_need)
            def _(xt=xt, r0=r0, rc=rc):
                xg = (
                    lax.broadcasted_iota(jnp.int32, (rc, 128), 1)
                    .astype(jnp.float32)
                    + (x0 + xt * 128).astype(jnp.float32)
                )
                wg = (
                    lax.broadcasted_iota(jnp.int32, (rc, 128), 0)
                    .astype(jnp.float32)
                    + (w0f + r0)
                )
                u = jnp.clip(A * xg + B * wg + C, 0.0, float(SWp - 1))
                uf = jnp.floor(u)
                fx = u - uf
                u0i = uf.astype(jnp.int32)
                u1i = jnp.minimum(u0i + 1, SWp - 1)
                p0, p1 = _banded_tap_pair(
                    lambda base: rows_ref[r0 : r0 + rc, pl.ds(base, 128)],
                    u0i, u1i, x_tiles_scan, jnp.zeros((rc, 128), jnp.int32),
                    SWp // 128,
                )
                for ch, (v0, v1) in enumerate(zip(_unpack3(p0), _unpack3(p1))):
                    t1t_ref[
                        ch, xt * 128 : (xt + 1) * 128, r0 : r0 + rc
                    ] = (v0 + (v1 - v0) * fx).T

    # ---- pass 2 on the (already transposed) intermediate ----
    whp = _round_up(wh, 128)
    outs = []
    for ch in range(3):
        for yt in range(whp // 128):
            for xc in range(ww // XCHUNK):
                yg = (
                    lax.broadcasted_iota(
                        jnp.int32, (XCHUNK, 128), 1
                    ).astype(jnp.float32)
                    + (y0 + yt * 128).astype(jnp.float32)
                )
                xg = (
                    lax.broadcasted_iota(
                        jnp.int32, (XCHUNK, 128), 0
                    ).astype(jnp.float32)
                    + (x0 + xc * XCHUNK).astype(jnp.float32)
                )
                v = c * xg + d * yg + f - w0f
                v = jnp.clip(v, 0.0, float(P - 1))
                vf = jnp.floor(v)
                fy = v - vf
                v0i = vf.astype(jnp.int32)
                v1i = jnp.minimum(v0i + 1, P - 1)
                q0, q1 = _banded_tap_pair(
                    lambda base, _xc=xc, _ch=ch: t1t_ref[
                        _ch, _xc * XCHUNK : (_xc + 1) * XCHUNK,
                        pl.ds(base, 128)
                    ],
                    v0i, v1i, y_tiles_scan,
                    jnp.zeros((XCHUNK, 128), jnp.float32),
                    Pp // 128,
                )
                outt_ref[
                    xc * XCHUNK : (xc + 1) * XCHUNK, yt * 128 : (yt + 1) * 128
                ] = q0 + (q1 - q0) * fy
        outs.append(outt_ref[:, :wh].T)  # back to (wh, ww)
    return tuple(outs)


def resample_affine_in_kernel(
    slab_ref, coeffs, x0, y0, wh, ww, P,
    rows_ref, t1t_ref, outt_ref, x_tiles_scan, y_tiles_scan,
):
    """Convenience wrapper when the whole slab is already in VMEM: computes
    the pass-1 row start, stages the row block, and resamples. (Mosaic loads
    support only one dynamic slice, hence the staging copy.)"""
    w0 = pass1_row_start(coeffs, x0, y0, wh, ww, P, slab_ref.shape[0])
    rows_ref[...] = slab_ref[pl.ds(w0, P), :]
    return resample_rows_in_kernel(
        rows_ref, w0, coeffs, x0, y0, wh, ww, P,
        t1t_ref, outt_ref, x_tiles_scan, y_tiles_scan,
    )


# ---------------------------------------------------------------------------
# Standalone pallas_call wrapper (tests / benchmarking / simple callers)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("wh", "ww", "P", "x_tiles_scan", "y_tiles_scan", "interpret"),
)
def affine_resample_pallas(
    slab, transform, x0, y0,
    *, wh: int, ww: int, P: int,
    x_tiles_scan: int = 4, y_tiles_scan: int = 4, interpret: bool = False,
):
    """Resample a (wh, ww) window at output origin (x0, y0) through an
    output->SLAB-coords affine from a packed padded slab (pack_padded_slab).
    Returns (wh, ww, 3) f32. See resample_affine_in_kernel for constraints."""
    Pp = _round_up(P, 128)
    SWp = slab.shape[1]

    def kernel(coef_ref, org_ref, slab_ref, out_ref, rows_ref,
               t1t_ref, outt_ref):
        coeffs = tuple(coef_ref[i] for i in range(6))
        r, g, b = resample_affine_in_kernel(
            slab_ref, coeffs, org_ref[0], org_ref[1], wh, ww, P,
            rows_ref, t1t_ref, outt_ref, x_tiles_scan, y_tiles_scan,
        )
        out_ref[0] = r
        out_ref[1] = g
        out_ref[2] = b

    A, B, C, c, d, f = two_pass_coeffs(jnp.asarray(transform, jnp.float32))
    coefs = jnp.stack([A, B, C, c, d, f]).astype(jnp.float32)
    org = jnp.stack([jnp.asarray(x0), jnp.asarray(y0)]).astype(jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, wh, ww), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((P, SWp), jnp.int32),
            pltpu.VMEM((3, ww, Pp), jnp.float32),
            pltpu.VMEM((ww, _round_up(wh, 128)), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(coefs, org, slab)
    return jnp.moveaxis(out, 0, -1)


# ---------------------------------------------------------------------------
# Pure-jnp reference with IDENTICAL semantics (for exactness tests)
# ---------------------------------------------------------------------------


def two_pass_reference(slab, transform, x0, y0, wh, ww, P):
    """Vectorized jnp re-statement of the kernel's exact arithmetic (same
    skewed two-pass, same clamps, same lerp forms). ``slab``: packed int32
    padded slab; ``transform`` maps output coords to slab coords."""
    SHp, SWp = slab.shape
    A, B, C, c, d, f = two_pass_coeffs(jnp.asarray(transform, jnp.float32))
    xs = jnp.float32(x0) + jnp.array([0.0, ww - 1.0])
    ys = jnp.float32(y0) + jnp.array([0.0, wh - 1.0])
    corners = c * xs[:, None] + d * ys[None, :] + f
    w0 = (jnp.floor(corners.min()).astype(jnp.int32) - 1) & ~7
    w0 = jnp.clip(w0, 0, SHp - P)

    wg, xg = jnp.meshgrid(
        w0 + jnp.arange(P, dtype=jnp.float32),
        x0 + jnp.arange(ww, dtype=jnp.float32),
        indexing="ij",
    )
    u = jnp.clip(A * xg + B * wg + C, 0.0, float(SWp - 1))
    uf = jnp.floor(u)
    fx = u - uf
    u0 = uf.astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, SWp - 1)
    rows = lax.dynamic_slice_in_dim(slab, w0, P, axis=0)

    yg2, xg2 = jnp.meshgrid(
        y0 + jnp.arange(wh, dtype=jnp.float32),
        x0 + jnp.arange(ww, dtype=jnp.float32),
        indexing="ij",
    )
    v = jnp.clip(c * xg2 + d * yg2 + f - w0, 0.0, float(P - 1))
    vf = jnp.floor(v)
    fy = v - vf
    v0 = vf.astype(jnp.int32)
    v1 = jnp.minimum(v0 + 1, P - 1)

    def chan(shift):
        vals = (rows >> shift) & 0xFF
        a0 = jnp.take_along_axis(vals, u0, axis=1).astype(jnp.float32)
        a1 = jnp.take_along_axis(vals, u1, axis=1).astype(jnp.float32)
        t1 = a0 + (a1 - a0) * fx
        b0 = jnp.take_along_axis(t1, v0, axis=0)
        b1 = jnp.take_along_axis(t1, v1, axis=0)
        return b0 + (b1 - b0) * fy

    return jnp.stack([chan(16), chan(8), chan(0)], axis=-1)


# ---------------------------------------------------------------------------
# f32 single-plane variants + bounded displacement warp (mode-9 machinery)
# ---------------------------------------------------------------------------


def resample_rows_f32(
    rows_ref,          # VMEM (P, SWp) f32: field rows [w0, w0+P) pre-staged
    w0, coeffs, x0, y0,
    wh: int, ww: int, P: int,
    t1t_ref,           # VMEM scratch (ww, Pp) f32
    outt_ref,          # VMEM scratch (ww, round_up(wh, 128)) f32
    x_tiles_scan: int, y_tiles_scan: int,
    sw: int = None,
):
    """Single-channel f32 twin of :func:`resample_rows_in_kernel` — used to
    sample smooth warp-field planes through an affine (forward-field flow
    lookups at moved positions, x2-upscaled background fields). Pass 1 is
    written transposed per block, like the 3-channel version. Returns one
    (wh, ww) f32 plane."""
    A, B, C, c, d, f = coeffs
    SWp = rows_ref.shape[1] if sw is None else sw
    Pp = t1t_ref.shape[1]
    XCHUNK = 128 if ww >= 128 else ww
    w0f = w0.astype(jnp.float32)
    rows_need = _pass1_rows_needed(coeffs, w0f, x0, y0, wh, ww, P)

    for xt in range(ww // 128):
        for r0 in range(0, P, PASS1_CHUNK):
            rc = min(PASS1_CHUNK, P - r0)

            @pl.when(jnp.float32(r0) < rows_need)
            def _(xt=xt, r0=r0, rc=rc):
                xg = (
                    lax.broadcasted_iota(jnp.int32, (rc, 128), 1)
                    .astype(jnp.float32)
                    + (x0 + xt * 128).astype(jnp.float32)
                )
                wg = (
                    lax.broadcasted_iota(jnp.int32, (rc, 128), 0)
                    .astype(jnp.float32)
                    + (w0f + r0)
                )
                u = jnp.clip(A * xg + B * wg + C, 0.0, float(SWp - 1))
                uf = jnp.floor(u)
                fx = u - uf
                u0i = uf.astype(jnp.int32)
                u1i = jnp.minimum(u0i + 1, SWp - 1)
                p0, p1 = _banded_tap_pair(
                    lambda base: rows_ref[r0 : r0 + rc, pl.ds(base, 128)],
                    u0i, u1i, x_tiles_scan,
                    jnp.zeros((rc, 128), jnp.float32),
                    SWp // 128,
                )
                t1t_ref[xt * 128 : (xt + 1) * 128, r0 : r0 + rc] = (
                    p0 + (p1 - p0) * fx
                ).T

    whp = _round_up(wh, 128)
    for yt in range(whp // 128):
        for xc in range(ww // XCHUNK):
            yg = (
                lax.broadcasted_iota(jnp.int32, (XCHUNK, 128), 1)
                .astype(jnp.float32)
                + (y0 + yt * 128).astype(jnp.float32)
            )
            xg = (
                lax.broadcasted_iota(jnp.int32, (XCHUNK, 128), 0)
                .astype(jnp.float32)
                + (x0 + xc * XCHUNK).astype(jnp.float32)
            )
            v = c * xg + d * yg + f - w0f
            v = jnp.clip(v, 0.0, float(P - 1))
            vf = jnp.floor(v)
            fy = v - vf
            v0i = vf.astype(jnp.int32)
            v1i = jnp.minimum(v0i + 1, P - 1)
            q0, q1 = _banded_tap_pair(
                lambda base, _xc=xc: t1t_ref[
                    _xc * XCHUNK : (_xc + 1) * XCHUNK, pl.ds(base, 128)
                ],
                v0i, v1i, y_tiles_scan,
                jnp.zeros((XCHUNK, 128), jnp.float32),
                Pp // 128,
            )
            outt_ref[
                xc * XCHUNK : (xc + 1) * XCHUNK, yt * 128 : (yt + 1) * 128
            ] = q0 + (q1 - q0) * fy
    return outt_ref[:, :wh].T


def _banded_lerp_rows(block_rows, u, n_tiles_scan: int, n_src_tiles: int,
                      width_valid: float, clamp_oob: bool = False):
    """Horizontal bilinear taps at per-element positions ``u`` over (R, cols)
    rows accessed via ``block_rows(base)`` -> (R, 128). Positions outside
    [0, width_valid-1] produce 0 (the displacement warps zero-pad, matching
    applyWarpFieldToTexture's boundary, cpp:237-252) unless ``clamp_oob``
    holds them at the edge value (the field self-composition's clamp
    semantics, WarpFields.cpp:375-384)."""
    ok = (u >= 0.0) & (u <= width_valid - 1.0)
    uc = jnp.clip(u, 0.0, width_valid - 1.0)
    uf = jnp.floor(uc)
    fx = uc - uf
    u0 = uf.astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, jnp.int32(width_valid - 1))
    p0, p1 = _banded_tap_pair(
        block_rows, u0, u1, n_tiles_scan,
        jnp.zeros(u.shape, jnp.float32), n_src_tiles,
    )
    # det_lerp pins the blend's FMA contraction so the mode-9 bank (whose
    # composition chaotically amplifies per-backend ulps) is bit-identical
    # across backends; these kernels are gather-bound, so the unfused
    # multiply-add costs nothing measurable.
    v = det_lerp(p0, p1, fx)
    return v if clamp_oob else jnp.where(ok, v, 0.0)


def _banded_lerp_rows_packed(block_rows, u, n_tiles_scan: int,
                             n_src_tiles: int, width_valid: float):
    """Packed-RGB twin of :func:`_banded_lerp_rows`: ``block_rows`` serves
    (R, 128) blocks of int32 ``(r<<16)|(g<<8)|b`` texels; ONE tap-pair
    gather feeds all three channel lerps (the gathers are the cost of the
    banded passes — this is the same 3-for-1 the packed slabs buy the
    affine resampler). OOB positions produce 0 on every channel (the
    zero-pad boundary of applyWarpFieldToTexture, cpp:237-252)."""
    ok = (u >= 0.0) & (u <= width_valid - 1.0)
    uc = jnp.clip(u, 0.0, width_valid - 1.0)
    uf = jnp.floor(uc)
    fx = uc - uf
    u0 = uf.astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, jnp.int32(width_valid - 1))
    p0, p1 = _banded_tap_pair(
        block_rows, u0, u1, n_tiles_scan,
        jnp.zeros(u.shape, jnp.int32), n_src_tiles,
    )
    outs = []
    for v0, v1 in zip(_unpack3(p0), _unpack3(p1)):
        v = det_lerp(v0, v1, fx)
        outs.append(jnp.where(ok, v, 0.0))
    return outs


def _pack_rgb_rounded(r, g, b):
    """Round three f32 channel planes (convex combinations of u8 values,
    so already in [0, 255] up to 1-ulp lerp overshoot that the int cast
    absorbs) into one packed int32 plane."""
    return (
        (jnp.round(r).astype(jnp.int32) << 16)
        | (jnp.round(g).astype(jnp.int32) << 8)
        | jnp.round(b).astype(jnp.int32)
    )


def displace_warp_rgb_in_kernel(
    src_ref,          # VMEM (whE, wwE) int32 packed-RGB source plane
    gdisp, vdisp, x0, y0, ex0, ey0,
    wh: int, ww: int, whE: int, wwE: int,
    ptmp_ref,         # VMEM scratch (whE, ww) int32
    ptmpT_ref,        # VMEM scratch (ww, round_up(whE, 128)) int32
    out3T_ref,        # VMEM scratch (3, ww, round_up(wh, 128)) f32
    x_scan: int = 3, y_scan: int = 3,
):
    """Separable bounded-displacement warp of a packed-RGB u8 plane — the
    3-channel twin of :func:`displace_warp_in_kernel` at ~1/3 the tap-gather
    cost. The pass-1 intermediate re-rounds to u8 and repacks; this matches
    the reference's own chain, which materializes the affine-resampled
    texture as a u8 CImg BEFORE applyWarpFieldToTexture bilinearly samples
    it (renderTransformedTexture cpp:341-346 -> cpp:237-252) — i.e. the
    quantize-resample-quantize structure is the reference's, with our one
    extra intermediate rounding from separability (<= 1/2 intensity level).
    Returns three (wh, ww) f32 channel planes."""
    for xt in range(ww // 128):
        u_frame = (
            lax.broadcasted_iota(jnp.int32, (whE, 128), 1).astype(jnp.float32)
            + (x0 + xt * 128).astype(jnp.float32)
            + gdisp[:, xt * 128 : (xt + 1) * 128]
        )
        u_loc = u_frame - ex0.astype(jnp.float32)
        r, g, b = _banded_lerp_rows_packed(
            lambda base: src_ref[:, pl.ds(base, 128)],
            u_loc, x_scan, wwE // 128, float(wwE),
        )
        # Static [0:whE] row slices: the scratch may be shared with (and
        # sized for) a taller caller.
        ptmp_ref[0:whE, xt * 128 : (xt + 1) * 128] = _pack_rgb_rounded(
            r, g, b
        )

    whEp = ptmpT_ref.shape[1]
    ptmpT_ref[:, :whE] = ptmp_ref[0:whE, :].T
    whp = _round_up(wh, 128)
    vdT = vdisp.T
    if whp > wh:
        vdT = jnp.concatenate(
            [vdT, jnp.zeros((ww, whp - wh), jnp.float32)], axis=1
        )
    for yt in range(whp // 128):
        for xc in range(ww // 128):
            v_frame = (
                lax.broadcasted_iota(jnp.int32, (128, 128), 1)
                .astype(jnp.float32)
                + (y0 + yt * 128).astype(jnp.float32)
            )
            xl = xc * 128
            vd = vdT[xl : xl + 128, yt * 128 : (yt + 1) * 128]
            v_loc = v_frame + vd - ey0.astype(jnp.float32)
            r, g, b = _banded_lerp_rows_packed(
                lambda base, _xc=xc: ptmpT_ref[
                    _xc * 128 : (_xc + 1) * 128, pl.ds(base, 128)
                ],
                v_loc, y_scan, whEp // 128, float(whE),
            )
            for ch, v in enumerate((r, g, b)):
                out3T_ref[ch, xl : xl + 128, yt * 128 : (yt + 1) * 128] = v
    return (
        out3T_ref[0, :, :wh].T,
        out3T_ref[1, :, :wh].T,
        out3T_ref[2, :, :wh].T,
    )


def displace_warp_in_kernel(
    src_ref,          # VMEM (whE, wwE) f32 source plane, frame origin (ey0, ex0)
    gdisp,            # (whE, ww) f32: pass-1 x-displacement at (col, row w)
    vdisp,            # (wh, ww) f32: pass-2 y-displacement at output pixels
    x0, y0,           # output window origin (frame coords, traced)
    ex0, ey0,         # expanded source origin (frame coords, traced)
    wh: int, ww: int, whE: int, wwE: int,
    tmp_ref,          # VMEM scratch (whE, ww) f32
    tmpT_ref,         # VMEM scratch (ww, round_up(whE, 128)) f32
    outT_ref,         # VMEM scratch (ww, round_up(wh, 128)) f32
    x_scan: int = 3, y_scan: int = 3, clamp_oob: bool = False,
):
    """Separable warp by a bounded smooth displacement field:
    ``out(p) = src(x + dx(p), y + dy(p))`` for |d| <= SLAB margin of the
    expansion, evaluated as two banded lane-gather passes. Exact bilinear
    when ``gdisp`` is the column-inverse-corrected x-field (built per bank
    epoch by warpfields.generator.make_warp_aux; the correction solves
    w = y + dy(x, y) per column so pass 1 reads x-displacements at the row
    pass 2 will fetch). Used for mode-9 mask/texture deformation
    (renderMasks / applyWarpFieldToTexture, cpp:237-252, 370-386)."""
    # ---- pass 1: tmp[w, x] = src(x + gdisp[w, x], ey0 + w) ----
    for xt in range(ww // 128):
        u_frame = (
            lax.broadcasted_iota(jnp.int32, (whE, 128), 1).astype(jnp.float32)
            + (x0 + xt * 128).astype(jnp.float32)
            + gdisp[:, xt * 128 : (xt + 1) * 128]
        )
        u_loc = u_frame - ex0.astype(jnp.float32)
        tmp_ref[:, xt * 128 : (xt + 1) * 128] = _banded_lerp_rows(
            lambda base: src_ref[:, pl.ds(base, 128)],
            u_loc, x_scan, wwE // 128, float(wwE), clamp_oob,
        )

    # ---- pass 2 on the transpose: out[y, x] = lerp rows of tmp at v ----
    whEp = tmpT_ref.shape[1]
    tmpT_ref[:, :whE] = tmp_ref[:].T
    whp = _round_up(wh, 128)
    # vdisp in (x, y) orientation, zero-padded to the 128-block grid.
    vdT = vdisp.T
    if whp > wh:
        vdT = jnp.concatenate(
            [vdT, jnp.zeros((ww, whp - wh), jnp.float32)], axis=1
        )
    for yt in range(whp // 128):
        for xc in range(ww // 128):
            ysz = 128
            v_frame = (
                lax.broadcasted_iota(jnp.int32, (128, ysz), 1)
                .astype(jnp.float32)
                + (y0 + yt * 128).astype(jnp.float32)
            )
            yl = yt * 128
            xl = xc * 128
            vd = vdT[xl : xl + 128, yl : yl + 128]
            v_loc = v_frame + vd - ey0.astype(jnp.float32)
            outT_ref[xl : xl + 128, yt * 128 : (yt + 1) * 128] = (
                _banded_lerp_rows(
                    lambda base, _xc=xc: tmpT_ref[
                        _xc * 128 : (_xc + 1) * 128, pl.ds(base, 128)
                    ],
                    v_loc, y_scan, whEp // 128, float(whE), clamp_oob,
                )
            )
    return outT_ref[:, :wh].T
