"""Mosaic kernels for warp-field self-composition (mode 9's bank producer).

The reference integrates each elementary displacer field 2^17-fold by binary
doubling, ``f <- f + f o (id + f)``, with dense bilinear lookups over the big
lattice (FlowField::init_from_DisplacementComposer, src/caffe/WarpFields.cpp:
337-437). The XLA rebuild of that loop is gather-bound (~2.4M quad-gather rows
per iteration at 1536^2 — ~160 ms per field on a v5e chip), which caps how
many fresh fields a bank epoch can afford and therefore the warp-crop
diversity (the reference serves each crop only ~3x, WarpFields.cpp:516-538).

This module removes every hot gather: the lookup ``f o (id + f)`` is a warp
of a smooth field by a BOUNDED displacement (|f| <= ~40 px), so it decomposes
into two banded lane-gather passes (ops/pallas_resample.displace_warp_in_
kernel) — exact bilinear when pass 1 reads its x-displacements at the row
pass 2 will fetch. That column-inverse correction is itself a per-column
fixed point ``w = y + f_y(x, y)`` solved on a 4x-coarse lattice by a few
banded VERTICAL lookups (a second tiny Mosaic kernel on the transposed
coarse planes), then upsampled by interleaving (no gathers).

Accuracy: the composed fields are sigma~50 px smooth; the coarse column
inverse leaves sub-0.2 px error in the corrected row and the separable warp
is exact bilinear up to the gdisp row-pair mismatch (sub-0.01 px) — orders
below the field magnitudes and the same class as the documented half-lattice
composition deviation (ROADMAP #8). CPU tests run these kernels in Pallas
interpreter mode against the XLA quad-gather composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import pallas_resample as resamp

COARSE = 4          # column-inverse lattice stride
SOLVE_ITERS = 8     # fixed-point iterations: the late compositions reach
                    # |dF_y/dy| ~ 0.7, so 0.7^8 ~ 0.06 px residual at the
                    # ~1 px contraction scale (cheap: coarse lattice)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Coarse column-inverse solve (transposed planes, banded lane lookups)
# ---------------------------------------------------------------------------


def _coarse_solve_kernel(dyT_ref, dxT_ref, gdT_ref, *, R, Lv, Lp, n_iter,
                        scan):
    """gdT[x, w] = dxT[x, y*] where w = y* + dyT[x, y*] (values in LATTICE
    units for dyT; dxT carries the output's units). All (1, R, Lp) blocks
    with the lane axis = the y/w lattice (``Lv`` valid lanes)."""
    for xt in range(Lp // 128):
        wpos = (
            lax.broadcasted_iota(jnp.int32, (R, 128), 1) + xt * 128
        ).astype(jnp.float32)
        d = jnp.zeros((R, 128), jnp.float32)
        for _ in range(n_iter):
            d = resamp._banded_lerp_rows(
                lambda base: dyT_ref[0, :, pl.ds(base, 128)],
                wpos - d, scan, Lp // 128, float(Lv), True,
            )
        gdT_ref[0, :, xt * 128 : (xt + 1) * 128] = resamp._banded_lerp_rows(
            lambda base: dxT_ref[0, :, pl.ds(base, 128)],
            wpos - d, scan, Lp // 128, float(Lv), True,
        )


def coarse_gdisp_batch(D, stride=COARSE, n_iter=SOLVE_ITERS,
                       interpret=False):
    """Column-inverse-corrected pass-1 x-displacement for a batch of
    displacement fields ``D`` (N, Hd, Wd, 2) in pixels: returns gdisp
    (N, Hd, Wd) f32 — gdisp(x, w) = D_x(x, y*), w = y* + D_y(x, y*) — via a
    coarse transposed banded solve (one grid program per field) + interleaved
    dyadic upsample. Zero hardware gathers. Hd/Wd must be multiples of
    ``stride`` (a power of two)."""
    N, Hd, Wd = D.shape[0], D.shape[1], D.shape[2]
    Hc, Wc = Hd // stride, Wd // stride
    Hcp = _round_up(Hc, 128)
    Dc = D[:, ::stride, ::stride]
    pad = ((0, 0), (0, 0), (0, Hcp - Hc))
    # Lattice units along the lane axis; pad lanes (never read: lookups
    # clamp at Lv-1).
    # * (1/stride), not /stride: stride is a power of two, so the host-folded
    # reciprocal multiply is exact; a backend's approximate-divide lowering
    # would not be bit-stable (bank content contract).
    dyT = jnp.pad(jnp.swapaxes(Dc[..., 1], 1, 2) * (1.0 / stride), pad)
    dxT = jnp.pad(jnp.swapaxes(Dc[..., 0], 1, 2), pad)
    dmax_lat = 64.0 / stride  # |D| bound (2x the crop bound, bg fields)
    scan = int((2 * dmax_lat + 131) // 128) + 1
    gdT = pl.pallas_call(
        functools.partial(
            _coarse_solve_kernel, R=Wc, Lv=Hc, Lp=Hcp, n_iter=n_iter,
            scan=scan,
        ),
        grid=(N,),
        out_shape=jax.ShapeDtypeStruct((N, Wc, Hcp), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, Wc, Hcp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Wc, Hcp), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Wc, Hcp), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(dyT, dxT)
    gd = jnp.swapaxes(gdT[..., :Hc], 1, 2)
    for _ in range(stride.bit_length() - 1):
        gd = _upsample2_plane(gd)
    return gd


def coarse_gdisp(D, stride=COARSE, n_iter=SOLVE_ITERS, interpret=False):
    """Single-field wrapper over :func:`coarse_gdisp_batch` for (S, S, 2)."""
    return coarse_gdisp_batch(D[None], stride, n_iter, interpret)[0]


def _upsample2_plane(p):
    """x2 bilinear upsample of (..., h, w) by interleaving values and
    midpoints (node i of the fine lattice = i/2 on the coarse one, edge
    replication past the last node — identical to clamped bilinear sampling
    at half-integer lattice coordinates) — no gathers."""
    h, w = p.shape[-2], p.shape[-1]
    nxt = jnp.concatenate([p[..., 1:, :], p[..., -1:, :]], axis=-2)
    rows = jnp.stack([p, (p + nxt) * 0.5], axis=-2).reshape(
        *p.shape[:-2], 2 * h, w
    )
    nxtc = jnp.concatenate([rows[..., 1:], rows[..., -1:]], axis=-1)
    return jnp.stack([rows, (rows + nxtc) * 0.5], axis=-1).reshape(
        *p.shape[:-2], 2 * h, 2 * w
    )


# ---------------------------------------------------------------------------
# Row-tiled separable displacement warp
# ---------------------------------------------------------------------------
# A whole-plane kernel (src + disp + out + 3 transpose scratches resident at
# once) oversubscribes VMEM at the production 1536^2 lattice (~66 MB + the
# unrolled pass temporaries). The horizontal pass is row-independent, so both
# passes run as ONE gridded kernel over row bands — pass 2 is the same kernel
# on XLA-transposed planes — holding only (3 x row_tile x S) f32 per program
# (~4.7 MB at 1536). The extra HBM transposes are ~0.1 ms/iteration, noise
# against the composition itself.


def _hwarp_kernel(src_ref, disp_ref, out_ref, *, n_tiles, scan):
    """out[r, x] = src[r, x + disp[r, x]] (bilinear along lanes, clamped)."""
    R = src_ref.shape[0]
    for xt in range(n_tiles):
        sl = slice(xt * 128, (xt + 1) * 128)
        u = (
            lax.broadcasted_iota(jnp.int32, (R, 128), 1) + xt * 128
        ).astype(jnp.float32) + disp_ref[:, sl]
        out_ref[:, sl] = resamp._banded_lerp_rows(
            lambda base: src_ref[:, pl.ds(base, 128)],
            u, scan, n_tiles, float(n_tiles * 128), True,
        )


def _hwarp_rows(planes, disp, interpret=False):
    """Horizontal bounded-displacement warp of (R, Sp) rows, |disp| <= 64 px,
    tiled over row bands (grid) so VMEM stays ~3 bands regardless of R."""
    R, Sp = planes.shape
    row_tile = 256 if R % 256 == 0 else 128
    scan = int((2 * 64.0 + 131) // 128) + 1  # |disp| <= 64 px
    return pl.pallas_call(
        functools.partial(_hwarp_kernel, n_tiles=Sp // 128, scan=scan),
        grid=(R // row_tile,),
        out_shape=jax.ShapeDtypeStruct((R, Sp), jnp.float32),
        in_specs=[
            pl.BlockSpec((row_tile, Sp), lambda i: (i, 0)),
            pl.BlockSpec((row_tile, Sp), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((row_tile, Sp), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(planes, disp)


def displace_planes_batch(srcs, gd, vd, interpret=False):
    """``out_mc(x, y) = src_mc(x + gd_m(x, y), y + vd_m(x, y))`` over
    (M, C, S, S) planes, each field m sharing one displacement — the lookup
    half of one composition doubling for M independent fields at once.
    ``gd``: the column-inverse-corrected pass-1 x-displacements (M, S, S)
    (indexed at (col, intermediate row)); ``vd``: the pass-2 y-displacements
    at output pixels. Positions outside the plane clamp (the caller freezes
    out-of-bounds pixels and flags them, matching WarpFields.cpp:389-398).

    The banded kernel requires the lane extent to be a multiple of 128
    (its pass loops cover 128-lane tiles); other sizes are edge-padded —
    exact, because clamp-at-the-padded-edge of a constant extension equals
    clamp-at-the-true-edge. All M*C planes stack along rows (the horizontal
    pass is row-independent), so each pass stays ONE kernel launch no matter
    how many fields compose together."""
    M, C, S = srcs.shape[0], srcs.shape[1], srcs.shape[2]
    Sp = _round_up(S, 128)
    if Sp != S:
        e = Sp - S
        srcs = jnp.pad(srcs, ((0, 0), (0, 0), (0, e), (0, e)), mode="edge")
        gd = jnp.pad(gd, ((0, 0), (0, e), (0, e)), mode="edge")
        vd = jnp.pad(vd, ((0, 0), (0, e), (0, e)), mode="edge")
    cat = srcs.reshape(M * C * Sp, Sp)
    gdc = jnp.broadcast_to(gd[:, None], (M, C, Sp, Sp)).reshape(
        M * C * Sp, Sp
    )
    tmp = _hwarp_rows(cat, gdc, interpret)
    tmpT = tmp.reshape(M, C, Sp, Sp).transpose(0, 1, 3, 2).reshape(
        M * C * Sp, Sp
    )
    vdT = jnp.broadcast_to(
        jnp.swapaxes(vd, -1, -2)[:, None], (M, C, Sp, Sp)
    ).reshape(M * C * Sp, Sp)
    outT = _hwarp_rows(tmpT, vdT, interpret)
    out = outT.reshape(M, C, Sp, Sp).transpose(0, 1, 3, 2)
    return out[:, :, :S, :S]


def displace_planes(srcs, gd, vd, interpret=False):
    """Single-field wrapper over :func:`displace_planes_batch` (C, S, S)."""
    return displace_planes_batch(srcs[None], gd[None], vd[None],
                                 interpret=interpret)[0]


def displace_plane(src, gd, vd, interpret=False):
    """Single-plane convenience wrapper over :func:`displace_planes`."""
    return displace_planes(src[None], gd, vd, interpret=interpret)[0]


# ---------------------------------------------------------------------------
# Composition loop
# ---------------------------------------------------------------------------


def self_compose_pallas_batch(fields_in, iters, interpret=False):
    """Banded-kernel twin of fields.self_compose over a BATCH: ``iters``
    doublings of ``f <- f + f o (id + f)`` with OOB freezing + NaN flagging
    for M independent fields at once. ``fields_in``: (M, S, S, 2). The
    lookup displacement field is each f itself, so each iteration solves the
    column inverses of the CURRENT fields then warps both channels — all M
    fields share every kernel launch (the bank builder composes
    2*warp_fields_per_batch fields; launch overhead amortizes M-fold)."""
    s = fields_in.shape[1]
    ys = jnp.arange(s, dtype=jnp.float32)
    py, px = jnp.meshgrid(ys, ys, indexing="ij")
    flagged0 = jnp.zeros(fields_in.shape[:3], bool)

    def body(carry, _):
        f, flagged = carry                              # (M, S, S, 2)
        tx = px[None] + f[..., 0]
        ty = py[None] + f[..., 1]
        oob = (tx < 0) | (tx >= s) | (ty < 0) | (ty >= s)
        flagged = flagged | oob
        gd = coarse_gdisp_batch(f, interpret=interpret)  # (M, S, S)
        lut = jnp.moveaxis(
            displace_planes_batch(jnp.moveaxis(f, -1, 1), gd, f[..., 1],
                                  interpret=interpret),
            1, -1,
        )
        f = jnp.where(oob[..., None], f, f + lut)
        return (f, flagged), None

    # scan (not fori) keeps the per-iteration pallas_calls un-unrolled.
    (f, flagged), _ = lax.scan(body, (fields_in, flagged0), None,
                               length=iters)
    oob_final = (
        (px[None] + f[..., 0] < 0)
        | (px[None] + f[..., 0] >= s)
        | (py[None] + f[..., 1] < 0)
        | (py[None] + f[..., 1] >= s)
    )
    flagged = flagged | oob_final
    return jnp.where(flagged[..., None], jnp.nan, f)


def self_compose_pallas(field, iters, interpret=False):
    """Single-field wrapper over :func:`self_compose_pallas_batch`."""
    return self_compose_pallas_batch(field[None], iters,
                                     interpret=interpret)[0]


def make_big_fields_pallas(keys, size, coarse_iters=16, interpret=False):
    """TPU-kernel twin of fields.make_big_field over a BATCH of field keys:
    same half-lattice schedule, same elementary fields, composition through
    the banded kernels with all ``2 * len(keys)`` directions (flow + iflow
    per key) sharing every kernel launch. Returns (flow, iflow), each
    (F, S, S, 2) with NaN-flagged out-of-bounds pixels."""
    from . import fields

    half = size // 2
    elems = []
    for key in keys:
        grid = fields.sample_displacer_grid(key, size)
        for inverse in (False, True):
            elems.append(
                fields.elementary_field(grid, half, inverse=inverse,
                                        stride=2.0)
                * 0.5
            )
    f_h = jnp.stack(elems)                               # (2F, half, half, 2)
    f_h = self_compose_pallas_batch(f_h, coarse_iters, interpret=interpret)
    f = 2.0 * jax.vmap(fields._upsample2)(jnp.nan_to_num(f_h))
    out = self_compose_pallas_batch(f, fields.COMPOSE_ITERS - coarse_iters,
                                    interpret=interpret)
    out = fields.clamp_near_zeros(out)
    return out[0::2], out[1::2]


def make_big_field_pallas(key, size, coarse_iters=16, interpret=False):
    """Single-key wrapper over :func:`make_big_fields_pallas`."""
    flow, iflow = make_big_fields_pallas([key], size, coarse_iters,
                                         interpret=interpret)
    return flow[0], iflow[0]
