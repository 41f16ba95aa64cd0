"""Photometric augmentation, fused into the generation step.

The reference repo emits raw renders; photometric jitter for FlowNet
training lived in separate Caffe augmentation layers (the IJCV paper's
training recipe follows FlowNet: per-image color, gamma, brightness,
contrast and additive Gaussian noise). Here it is an optional stage
(``DataGenConfig.photometric_augment``) fused into the same XLA program as
the renderer — zero extra dispatches, a few elementwise ops per pixel that
XLA folds into the output adapter.

Pair semantics: geometric ground truth must stay valid, so the color /
gamma / brightness / contrast transform is drawn ONCE per sample and applied
identically to both frames (flow is invariant under any such shared map);
only the additive sensor noise is drawn independently per frame (real pairs
never share noise, and it teaches the matcher noise robustness).

Randomness derives from ``fold_in(sample_key, AUX_PHOTOMETRIC)`` with an id
OUTSIDE the Stream bits-table layout (flowgen/random/streams.py
``_build_layout``: the table stride is part of the seed contract), so
enabling the stage does not reshuffle scene content for a given seed.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# Fold-in id for the photometric key chain. Deliberately NOT a member of
# random.streams.Stream: adding enum members changes the bits-table stride
# and with it every generated scene (CLAUDE.md invariant).
AUX_PHOTOMETRIC = 101


class PhotoParams(NamedTuple):
    """Jitter ranges, FlowNet's training defaults (Dosovitskiy et al. 2015,
    the recipe the reference's data fed into — README.md:5)."""

    color_range: Tuple[float, float] = (0.5, 2.0)      # per-channel multiplier
    gamma_range: Tuple[float, float] = (0.7, 1.5)
    brightness_sigma: float = 0.2                      # additive, [0,1] scale
    contrast_range: Tuple[float, float] = (-0.8, 0.4)  # factor = 1 + c
    noise_sigma_range: Tuple[float, float] = (0.0, 0.04)  # per-frame


def augment_pair(key, img0, img1, params: PhotoParams = PhotoParams()):
    """Jitter one (H, W, 3) 0..255 float image pair. Returns the augmented
    pair, same dtype/range. All shared draws precede the per-frame noise
    draws so the transform is one key-split regardless of frame count."""
    kc, kg, kb, kk, ks, kn0, kn1 = jax.random.split(key, 7)
    color = jax.random.uniform(
        kc, (3,), minval=params.color_range[0], maxval=params.color_range[1]
    )
    gamma = jax.random.uniform(
        kg, (), minval=params.gamma_range[0], maxval=params.gamma_range[1]
    )
    bright = params.brightness_sigma * jax.random.normal(kb, ())
    contrast = 1.0 + jax.random.uniform(
        kk, (),
        minval=params.contrast_range[0], maxval=params.contrast_range[1],
    )
    noise_sigma = jax.random.uniform(
        ks, (),
        minval=params.noise_sigma_range[0],
        maxval=params.noise_sigma_range[1],
    )

    def shared(x):
        x = x * (color / 255.0)
        x = jnp.power(jnp.maximum(x, 1e-6), gamma)
        x = x + bright
        return (x - 0.5) * contrast + 0.5

    def one(x, kn):
        x = shared(x) + noise_sigma * jax.random.normal(kn, x.shape)
        return jnp.clip(x, 0.0, 1.0) * 255.0

    return one(img0, kn0), one(img1, kn1)


def augment_batch(root, indices, images0, images1,
                  params: PhotoParams = PhotoParams()):
    """Vmapped :func:`augment_pair` over a batch, keyed per GLOBAL sample
    index (content stays batch-size- and device-count-invariant)."""
    from ..random.streams import sample_key

    def one(i, a, b):
        k = jax.random.fold_in(sample_key(root, i), AUX_PHOTOMETRIC)
        return augment_pair(k, a, b, params)

    return jax.vmap(one)(indices, images0, images1)
