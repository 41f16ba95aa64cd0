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

    ``impl``: "xla" (quad-gather composition, fields.make_big_field),
    "pallas" (banded Mosaic kernels, pallas_fields.make_big_field_pallas —
    ~10x cheaper on TPU, which is what lets ``warp_fields_per_batch`` reach
    reference-grade crop diversity), or None to follow ``cfg.use_pallas``.
    The two implementations agree to sub-2% of the field magnitude
    (tests/test_pallas_fields.py) but are not bit-identical, so the choice
    is part of the content contract for mode-9 scenes."""
    from ..compose.render import _pallas_enabled

    W, H = cfg.width, cfg.height
    big = big_field_size(W, H)
    origins = crop_origins(W, H)
    if impl is None:
        impl = "pallas" if _pallas_enabled(cfg) else "xla"
    if impl == "pallas":
        from .pallas_fields import make_big_field_pallas as field_builder
    else:
        field_builder = fields.make_big_field

    bank_epoch = step // max(cfg.warp_bank_reuse_steps, 1)

    def one_field(i):
        key = stream_key(jax.random.fold_in(root, bank_epoch), Stream.WARP_FIELD, i)
        flow, iflow = field_builder(key, big)
        crops_f = jnp.stack([flow[y : y + H, x : x + W] for (x, y) in origins])
        crops_i = jnp.stack([iflow[y : y + H, x : x + W] for (x, y) in origins])
        return crops_f, crops_i

    banks = [one_field(i) for i in range(cfg.warp_fields_per_batch)]
    flow = jnp.concatenate([b[0] for b in banks])
    iflow = jnp.concatenate([b[1] for b in banks])
    return WarpBank(flow=flow, iflow=iflow)


def _column_inverse_gdisp(D, n_iter: int = 4, coarse: int = 4):
    """Pass-1 x-displacement with the column-inverse correction for a
    displacement field ``D`` (Hh, W, 2) in plane-row units:
    gdisp(x, w) = D_x(x, y*) where y* solves w = y + D_y(x, y)
    (fixed point; |d D_y/dy| < 1 for the bank's composed diffeomorphisms,
    so a few iterations converge to sub-0.1 px).

    The fixed point runs on a ``coarse``-downsampled grid (the composed
    fields are sigma~50 px smooth, so the column inverse is accurately
    bilinear-upsampled) — ~16x fewer gathers than a full-resolution solve."""
    from ..ops import texture as tex_mod

    Hh, Ww = D.shape[0], D.shape[1]
    dx = D[..., 0:1]
    dy_p = D[..., 1:2]
    hc, wc = Hh // coarse, Ww // coarse
    yy, xx = jnp.meshgrid(
        jnp.arange(hc, dtype=jnp.float32) * coarse,
        jnp.arange(wc, dtype=jnp.float32) * coarse,
        indexing="ij",
    )
    y = yy
    for _ in range(n_iter):
        d = tex_mod.sample_bilinear(dy_p, xx, y, wrap="clamp")[..., 0]
        y = yy - d
    gd = tex_mod.sample_bilinear(dx, xx, y, wrap="clamp")[..., 0]
    yyf, xxf = jnp.meshgrid(
        jnp.arange(Hh, dtype=jnp.float32) / coarse,
        jnp.arange(Ww, dtype=jnp.float32) / coarse,
        indexing="ij",
    )
    return tex_mod.sample_bilinear(gd[..., None], xxf, yyf, wrap="clamp")[
        ..., 0
    ]


def make_warp_aux(bank: WarpBank, n_iter: int = 4, coarse: int = 4):
    """Preprocess a crop bank for the scene megakernel's separable
    displacement warps. Returns ``(obj_aux, bg_aux)``:

    ``obj_aux`` (N, 4, H, W) f32:
      [0] gdisp — column-inverse-corrected pass-1 x-displacement of the
          inverse field (see :func:`_column_inverse_gdisp`),
      [1] vdisp — iflow_y (pass-2 y-displacement),
      [2],[3] — the forward field (flow lookups at moved positions,
          getPointFlow cpp:398-406), NaN-scrubbed.

    ``bg_aux`` (N, 2, H + 2*BG_EY, W) f32: the same [gdisp, vdisp] pair for
    the BACKGROUND's x2-upscaled inverse field (the crop applied x2 in size
    and magnitude, cpp:1194-1202), evaluated on the extended frame grid
    (rows -BG_EY .. H+BG_EY) that the in-kernel bg displacement reads.

    Amortized per bank epoch like the bank itself (the only gathers left on
    the mode-9 hot path)."""
    from ..ops import texture as tex_mod
    from ..ops.pallas_scene import BG_EY

    iflow = jnp.nan_to_num(bank.iflow)
    flow = jnp.nan_to_num(bank.flow)

    def one(iflo):
        gd = _column_inverse_gdisp(iflo, n_iter, coarse)
        return jnp.stack([gd, iflo[..., 1]], 0)

    def one_bg(iflo):
        H, W = iflo.shape[0], iflo.shape[1]
        ys = jnp.arange(-BG_EY, H + BG_EY, dtype=jnp.float32)
        xs = jnp.arange(W, dtype=jnp.float32)
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        u = (xx + W / 2.0 + 0.5) / 2.0 - 0.5
        v = (yy + H / 2.0 + 0.5) / 2.0 - 0.5
        D = 2.0 * tex_mod.sample_bilinear(iflo, u, v, wrap="clamp")
        gd = _column_inverse_gdisp(D, n_iter, coarse)
        return jnp.stack([gd, D[..., 1]], 0)

    aux01 = jax.vmap(one)(iflow)                    # (N, 2, H, W)
    wf = jnp.moveaxis(flow, -1, 1)                  # (N, 2, H, W)
    obj_aux = jnp.concatenate([aux01, wf], axis=1)
    bg_aux = jax.vmap(one_bg)(iflow)                # (N, 2, H+2*BG_EY, W)
    return obj_aux, bg_aux
