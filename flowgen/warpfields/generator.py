"""Warp-crop bank generation: the async CropGenerator, made stateless.

The reference runs 10 producer threads that build 1536^2 composed fields and
tile WxH crops into a throttled shared queue, each crop served 3 times
(WarpFields::CropGenerator, src/caffe/WarpFields.cpp:469-641); consumers block
on supply. On TPU the producer/consumer machinery disappears: each batch
deterministically derives its own crop bank from ``(seed, step)`` on-device,
and objects index into it (Scene.*.warp_slot). Supply can never stall and the
bank is reproducible — the reference's queue is seeded from std::random_device
and inherently non-deterministic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..compose.render import WarpBank
from ..config import DataGenConfig
from ..random.streams import Stream, stream_key
from . import fields


# Finite stand-in for the reference's signaling NaNs (WarpFields.cpp:389-398)
# inside the render kernels: under ``warp_oob="nan"`` flagged bank pixels
# carry OOB_SENTINEL through the forward-flow channels, so any emitted-flow
# pixel whose bilinear footprint touches one lands far beyond
# OOB_FLOW_THRESH and is converted to NaN at output adaptation
# (pipeline/generator._adapt_output). Kernels stay NaN-free (Mosaic f32
# selects/min/max on NaN are not portable), and the sentinel survives every
# linear resampling stage with weights down to ~1e-9 — far below the
# smallest nonzero f32 bilinear weight of a representable coordinate.
OOB_SENTINEL = 4.0e18
OOB_FLOW_THRESH = 1.0e9


def apply_oob_policy(bank: WarpBank, policy: str) -> WarpBank:
    """Encode ``cfg.warp_oob`` into a crop bank: "zero" passes through (the
    samplers scrub NaN to zero displacement); "nan" replaces flagged
    forward-flow pixels with OOB_SENTINEL (see above). The inverse field is
    left as-is in both — mask/texture warping always scrubs it."""
    if policy == "nan":
        return bank._replace(
            flow=jnp.where(jnp.isnan(bank.flow), OOB_SENTINEL, bank.flow)
        )
    return bank


def big_field_size(width: int, height: int) -> int:
    return 3 * max(width, height)  # WarpFields.cpp:556


def crop_origins(width: int, height: int):
    """Static crop tiling of the big field (cpp:619-634): stride (W/3, H/3),
    margins W/4 .. big - 5W/4."""
    big = big_field_size(width, height)
    xs = list(range(width // 4, big - 5 * width // 4, width // 3))
    ys = list(range(height // 4, big - 5 * height // 4, height // 3))
    return [(x, y) for y in ys for x in xs]


def n_crops_per_field(width: int, height: int) -> int:
    return len(crop_origins(width, height))


def bank_size(cfg: DataGenConfig) -> int:
    return n_crops_per_field(cfg.width, cfg.height) * cfg.warp_fields_per_batch


def make_warp_bank(root, step, cfg: DataGenConfig,
                   impl: str | None = None) -> WarpBank:
    """Build the crop bank for one batch step: ``warp_fields_per_batch`` big
    fields, tiled into all their crops. Keyed by (root seed, step).

    ``impl``: "pallas" (banded Mosaic kernels,
    pallas_fields.make_big_field_pallas — ~10x cheaper on TPU, which is what
    lets ``warp_fields_per_batch`` reach reference-grade crop diversity; run
    in interpret mode off-TPU so content is backend-invariant), "xla"
    (quad-gather composition, fields.make_big_field), or None to follow
    ``cfg.warp_bank_impl``. The two implementations agree to sub-2% of the
    field magnitude (tests/test_pallas_fields.py) but are not bit-identical,
    so the choice is part of the content contract for mode-9 scenes — it is
    a config dial, NEVER a backend autodetect (the reference has one
    implementation, WarpFields.cpp:337-437, and so does a given config
    here)."""
    flows, iflows = _big_fields(root, step, cfg, impl)
    return _crop_bank(flows, iflows, cfg)


def _big_fields(root, step, cfg: DataGenConfig, impl: str | None = None):
    """The epoch's ``warp_fields_per_batch`` composed big fields, each with
    its inverse: (flows, iflows), (F, big, big, 2) with NaN-flagged OOB."""
    W, H = cfg.width, cfg.height
    big = big_field_size(W, H)
    if impl is None:
        impl = cfg.warp_bank_impl

    bank_epoch = step // max(cfg.warp_bank_reuse_steps, 1)
    keys = [
        stream_key(jax.random.fold_in(root, bank_epoch), Stream.WARP_FIELD, i)
        for i in range(cfg.warp_fields_per_batch)
    ]

    if impl == "pallas":
        # All fields (and both directions each) compose through shared
        # banded-kernel launches — the launch overhead that dominates the
        # per-field cost amortizes 2F-fold.
        from .pallas_fields import make_big_fields_pallas

        interpret = jax.default_backend() == "cpu"
        flows, iflows = make_big_fields_pallas(keys, big, interpret=interpret)
    else:
        pairs = [fields.make_big_field(k, big) for k in keys]
        flows = jnp.stack([p[0] for p in pairs])
        iflows = jnp.stack([p[1] for p in pairs])
    return flows, iflows


def _crop_bank(flows, iflows, cfg: DataGenConfig) -> WarpBank:
    W, H = cfg.width, cfg.height
    origins = crop_origins(W, H)
    flow = jnp.concatenate(
        [jnp.stack([f[y : y + H, x : x + W] for (x, y) in origins])
         for f in flows]
    )
    iflow = jnp.concatenate(
        [jnp.stack([f[y : y + H, x : x + W] for (x, y) in origins])
         for f in iflows]
    )
    return apply_oob_policy(WarpBank(flow=flow, iflow=iflow), cfg.warp_oob)


def _gdisp_xla(D, n_iter: int = 4, coarse: int = 4):
    """Pass-1 x-displacements with the column-inverse correction for a batch
    of displacement fields ``D`` (N, Hh, W, 2) in plane-row units:
    gdisp(x, w) = D_x(x, y*) where y* solves w = y + D_y(x, y)
    (fixed point; |d D_y/dy| < 1 for the bank's composed diffeomorphisms,
    so a few iterations converge to sub-0.1 px).

    XLA gather fallback for CPU runs: the fixed point runs on a ``coarse``-
    downsampled grid (the composed fields are sigma~50 px smooth, so the
    column inverse is accurately bilinear-upsampled) — ~16x fewer gathers
    than a full-resolution solve; the upsample back is interleaved dyadic
    midpoints (exactly clamped bilinear at quarter-lattice points)."""
    from ..ops import texture as tex_mod
    from .pallas_fields import _upsample2_plane

    def one(Dk):
        Hh, Ww = Dk.shape[0], Dk.shape[1]
        hc, wc = Hh // coarse, Ww // coarse
        yy, xx = jnp.meshgrid(
            jnp.arange(hc, dtype=jnp.float32) * coarse,
            jnp.arange(wc, dtype=jnp.float32) * coarse,
            indexing="ij",
        )
        y = yy
        for _ in range(n_iter):
            d = tex_mod.sample_bilinear(Dk[..., 1:2], xx, y,
                                        wrap="clamp")[..., 0]
            y = yy - d
        return tex_mod.sample_bilinear(Dk[..., 0:1], xx, y,
                                       wrap="clamp")[..., 0]

    gd = jax.vmap(one)(D)
    for _ in range(coarse.bit_length() - 1):
        gd = _upsample2_plane(gd)
    return gd


def _half_offset_expand(p, axis: int, c0: int, n_pairs: int):
    """Clamped linear sampling of ``p`` along ``axis`` (>= 0) at the x2
    zoom-out lattice ``pos_j = c0 + j/2 + 0.75`` for j = 0..2*n_pairs-1
    (fractional parts alternate 0.75 / 0.25) — static slices + lerps, no
    gathers."""
    n = p.shape[axis]
    lo, hi = c0, c0 + n_pairs + 2
    if lo < 0 or hi > n:
        pw = [(0, 0)] * p.ndim
        pw[axis] = (max(-lo, 0), max(hi - n, 0))
        p = jnp.pad(p, pw, mode="edge")
        c0 += max(-lo, 0)

    def sl(s):
        idx = [slice(None)] * p.ndim
        idx[axis] = slice(s, s + n_pairs)
        return p[tuple(idx)]

    a, b, c = sl(c0), sl(c0 + 1), sl(c0 + 2)
    even = 0.25 * a + 0.75 * b
    odd = 0.75 * b + 0.25 * c
    out = jnp.stack([even, odd], axis=axis + 1)
    shape = list(p.shape)
    shape[axis] = 2 * n_pairs
    return out.reshape(shape)


def bg_upscale(iflow, bg_ey: int):
    """The background's x2-upscaled displacement fields on the extended
    frame grid: ``D(y, x) = 2 * iflow((x + W/2 + .5)/2 - .5,
    (y + H/2 + .5)/2 - .5)`` for rows y in [-bg_ey, H + bg_ey) (the crop
    applied x2 in size and magnitude, cpp:1194-1202). The sample lattice is
    axis-aligned with stride 1/2 and quarter-pixel offsets, so it reduces to
    two interleaved slice-lerps per axis — no gathers. Requires H, W
    multiples of 4 and even ``bg_ey`` (DataGenConfig validates the frame
    geometry). ``iflow``: (N, H, W, 2) -> (N, H + 2*bg_ey, W, 2)."""
    H, W = iflow.shape[1], iflow.shape[2]
    rows = _half_offset_expand(iflow, 1, H // 4 - bg_ey // 2 - 1,
                               (H + 2 * bg_ey) // 2)
    return 2.0 * _half_offset_expand(rows, 2, W // 4 - 1, W // 2)


def make_warp_aux(bank: WarpBank, n_iter: int | None = None,
                  coarse: int = 4, use_pallas: bool | None = None,
                  interpret: bool = False):
    """Preprocess a crop bank for the scene megakernel's separable
    displacement warps. Returns ``(obj_aux, bg_aux)``:

    ``obj_aux`` (N, 4, H, W) f32:
      [0] gdisp — column-inverse-corrected pass-1 x-displacement of the
          inverse field (coarse fixed-point solve + interleaved upsample),
      [1] vdisp — iflow_y (pass-2 y-displacement),
      [2],[3] — the forward field (flow lookups at moved positions,
          getPointFlow cpp:398-406), NaN-scrubbed.

    ``bg_aux`` (N, 2, H + 2*BG_EY, W) f32: the same [gdisp, vdisp] pair for
    the BACKGROUND's x2-upscaled inverse field (see :func:`bg_upscale`),
    evaluated on the extended frame grid (rows -BG_EY .. H+BG_EY) that the
    in-kernel bg displacement reads.

    Amortized per bank epoch like the bank itself. On TPU
    (``use_pallas=None`` follows the backend) the whole preprocess is
    gather-free: the column-inverse solve runs as a banded Mosaic kernel
    over the coarse transposed planes (pallas_fields.coarse_gdisp_batch)
    and every resample is an interleaved slice-lerp; the CPU fallback keeps
    XLA gathers for the coarse solve only."""
    from ..ops.pallas_scene import BG_EY
    from . import pallas_fields as pf

    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"

    iflow = jnp.nan_to_num(bank.iflow)
    flow = jnp.nan_to_num(bank.flow)
    D_bg = bg_upscale(iflow, BG_EY)

    if use_pallas or interpret:
        solve = lambda D: pf.coarse_gdisp_batch(D, stride=coarse,
                                                n_iter=n_iter or 8,
                                                interpret=interpret)
    else:
        solve = lambda D: _gdisp_xla(D, n_iter or 4, coarse)

    gd = solve(iflow)                               # (N, H, W)
    obj_aux = jnp.concatenate(
        [gd[:, None], iflow[..., 1][:, None], jnp.moveaxis(flow, -1, 1)],
        axis=1,
    )
    gd_bg = solve(D_bg)                             # (N, H+2*BG_EY, W)
    bg_aux = jnp.stack([gd_bg, D_bg[..., 1]], axis=1)
    return obj_aux, bg_aux


def make_bank_and_aux(root, step, cfg: DataGenConfig,
                      impl: str | None = None, n_iter: int | None = None,
                      coarse: int = 4):
    """Bank + megakernel aux from SHARED big fields — the hot-path producer.

    :func:`make_warp_aux` solves the separable-warp column inverse per crop
    (bank_size solves at crop size, plus as many again for the x2-upscaled
    background fields). But every crop is a restriction of one of the
    ``warp_fields_per_batch`` big fields, and the column inverse COMMUTES
    with both restriction and the background's x2 zoom:

    * restriction: a crop's column is a sub-segment of the big field's
      column, so ``gdisp_crop(x, w) = gdisp_big(cx + x, cy + w)`` — and the
      big solve is the better extension where the displaced row y* leaves
      the crop (the per-crop solve clamped at the crop edge);
    * zoom: for ``D2(p) = 2 D(z(p))`` with ``z`` the half-scale lattice map
      (cpp:1194-1202), the fixed point ``w = y + D2_y(x, y)`` maps exactly
      to the half-coordinate one, so ``gdisp2(x, w) = 2 gdisp_big(z(x),
      z(w))`` — the x2-zoomed background field's corrected pass-1
      displacement is just the x2 upsample (the same quarter-offset
      slice-lerp lattice as :func:`bg_upscale`) of the big field's.

    So ONE coarse solve per big field (F at (big/coarse)^2) replaces
    2*bank_size crop-sized solves (~7x less solve work at 512x384), and the
    crop-edge clamping artifact disappears. The solve implementation follows
    ``impl`` (default ``cfg.warp_bank_impl``) like the bank composition
    itself, so the whole mode-9 content stream is a function of the config
    dial, never the backend (the banded Mosaic solve runs in interpret mode
    off-TPU; ``"xla"`` uses the gather fixed point on the big lattice).

    Returns ``(bank, (obj_aux, bg_aux))`` with the shapes and meanings of
    :func:`make_warp_aux`'s outputs."""
    from ..ops.pallas_scene import BG_EY
    from . import pallas_fields as pf

    W, H = cfg.width, cfg.height
    origins = crop_origins(W, H)
    if impl is None:
        impl = cfg.warp_bank_impl
    flows, iflows = _big_fields(root, step, cfg, impl)
    bank = _crop_bank(flows, iflows, cfg)

    big_i = jnp.nan_to_num(iflows)
    # The forward-flow channels feed emitted flow, so they carry the
    # warp_oob policy exactly like the bank's (apply_oob_policy): under
    # "nan" flagged pixels become the finite OOB sentinel and survive the
    # scrub; under "zero" they scrub to zero displacement.
    big_f = jnp.nan_to_num(
        jnp.where(jnp.isnan(flows), OOB_SENTINEL, flows)
        if cfg.warp_oob == "nan" else flows
    )
    if impl == "pallas":
        interpret = jax.default_backend() == "cpu"
        gd_big = pf.coarse_gdisp_batch(
            big_i, stride=coarse, n_iter=n_iter or 8, interpret=interpret
        )                                               # (F, S, S)
    else:
        gd_big = _gdisp_xla(big_i, n_iter or 4, coarse)

    # obj_aux: plain crops of [gdisp, iflow_y, flow_x, flow_y].
    big4 = jnp.stack(
        [gd_big, big_i[..., 1], big_f[..., 0], big_f[..., 1]], axis=1
    )                                                   # (F, 4, S, S)
    obj_aux = jnp.concatenate(
        [jnp.stack([f4[:, y : y + H, x : x + W] for (x, y) in origins])
         for f4 in big4]
    )                                                   # (N, 4, H, W)

    # bg_aux: x2-upsampled [gdisp, iflow_y] on the extended frame grid —
    # bg_upscale's quarter-offset lattice shifted by each crop's origin.
    big2 = jnp.stack([gd_big, big_i[..., 1]], axis=1)   # (F, 2, S, S)
    n_pairs_r = (H + 2 * BG_EY) // 2
    per_origin = []
    for (x, y) in origins:
        r = _half_offset_expand(
            big2, 2, y + H // 4 - BG_EY // 2 - 1, n_pairs_r
        )
        per_origin.append(
            2.0 * _half_offset_expand(r, 3, x + W // 4 - 1, W // 2)
        )
    bg_aux = jnp.stack(per_origin, axis=1).reshape(
        -1, 2, H + 2 * BG_EY, W
    )                                                   # (N, 2, HB, W)
    return bank, (obj_aux, bg_aux)
