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


def make_warp_bank(root, step, cfg: DataGenConfig) -> WarpBank:
    """Build the crop bank for one batch step: ``warp_fields_per_batch`` big
    fields, tiled into all their crops. Keyed by (root seed, step)."""
    W, H = cfg.width, cfg.height
    big = big_field_size(W, H)
    origins = crop_origins(W, H)

    bank_epoch = step // max(cfg.warp_bank_reuse_steps, 1)

    def one_field(i):
        key = stream_key(jax.random.fold_in(root, bank_epoch), Stream.WARP_FIELD, i)
        flow, iflow = fields.make_big_field(key, big)
        crops_f = jnp.stack([flow[y : y + H, x : x + W] for (x, y) in origins])
        crops_i = jnp.stack([iflow[y : y + H, x : x + W] for (x, y) in origins])
        return crops_f, crops_i

    banks = [one_field(i) for i in range(cfg.warp_fields_per_batch)]
    flow = jnp.concatenate([b[0] for b in banks])
    iflow = jnp.concatenate([b[1] for b in banks])
    return WarpBank(flow=flow, iflow=iflow)


def make_warp_aux(bank: WarpBank, n_iter: int = 4, coarse: int = 4):
    """Preprocess a crop bank for the scene megakernel's separable
    displacement warp: (N, 4, H, W) f32 planes

      [0] gdisp — pass-1 x-displacement with the column-inverse correction:
          gdisp(x, w) = iflow_x(x, y*) where y* solves w = y + iflow_y(x, y)
          (fixed point, |d iflow_y / dy| < 1 for the bank's composed
          diffeomorphisms, so ~8 iterations converge to sub-0.01 px),
      [1] vdisp — iflow_y (pass-2 y-displacement),
      [2],[3] — the forward field (flow lookups at moved positions,
          getPointFlow cpp:398-406), NaN-scrubbed.

    The fixed point runs on a ``coarse``-downsampled grid (the composed
    fields are sigma~50 px smooth, so the column inverse is accurately
    bilinear-upsampled; 4 iterations with contraction |d ify/dy| < ~0.4
    leave sub-0.2 px error in the corrected row) — this keeps the gather
    count ~16x below a full-resolution solve. Amortized per bank epoch like
    the bank itself (the only gathers left on the mode-9 hot path)."""
    from ..ops import texture as tex_mod

    iflow = jnp.nan_to_num(bank.iflow)
    flow = jnp.nan_to_num(bank.flow)

    def one(iflo):
        H, W = iflo.shape[0], iflo.shape[1]
        ifx = iflo[..., 0:1]
        ify = iflo[..., 1:2]
        hc, wc = H // coarse, W // coarse
        yy, xx = jnp.meshgrid(
            jnp.arange(hc, dtype=jnp.float32) * coarse,
            jnp.arange(wc, dtype=jnp.float32) * coarse,
            indexing="ij",
        )
        y = yy
        for _ in range(n_iter):
            dy = tex_mod.sample_bilinear(ify, xx, y, wrap="clamp")[..., 0]
            y = yy - dy
        gd = tex_mod.sample_bilinear(ifx, xx, y, wrap="clamp")[..., 0]
        # Bilinear upsample back to (H, W).
        yyf, xxf = jnp.meshgrid(
            jnp.arange(H, dtype=jnp.float32) / coarse,
            jnp.arange(W, dtype=jnp.float32) / coarse,
            indexing="ij",
        )
        gd_full = tex_mod.sample_bilinear(
            gd[..., None], xxf, yyf, wrap="clamp"
        )[..., 0]
        return jnp.stack([gd_full, iflo[..., 1]], 0)

    aux01 = jax.vmap(one)(iflow)                    # (N, 2, H, W)
    wf = jnp.moveaxis(flow, -1, 1)                  # (N, 2, H, W)
    return jnp.concatenate([aux01, wf], axis=1)
