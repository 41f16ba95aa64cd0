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
