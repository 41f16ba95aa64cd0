"""Texture database loading and atlas packing.

TPU-native replacement for ``Texture`` / ``TextureCollection``
(src/caffe/DataGenerator.cpp:77-161): the reference loads every image listed in
a text file into host RAM once at startup and later runs CImg crop chains per
sample on CPU threads. Here textures are decoded once, normalized to one
canonical resolution, and packed into a single HBM-resident atlas
``(T, 2H, 2W, 3) float32``; all per-sample randomization happens on-device as
affine gathers (flowgen/ops/texture.py).

Canonicalization note: the reference keeps original resolutions and its
background crop geometry depends on them (getRandomizedCrop, cpp:87-109);
normalizing to 2Hx2W (the largest crop any mode requests) fixes that geometry
to the equivalent of a 1024x768 source. Texture *content* distribution is
preserved; per-image field-of-view variation from heterogeneous source sizes
is not (documented deviation).

Decoding uses the native loader (texture_io/native, C++ multi-threaded) when
built, falling back to PIL. ``load_texture_db`` accepts the same list-file
format as the reference's ``texture_dbases`` proto field (one image path per
line, caffe.proto:8).
"""

from __future__ import annotations

import os
from typing import Iterable, Sequence

import numpy as np

from ..config import DataGenConfig
from .native import native_loader_available, load_images_native


def _decode_pil(path: str, out_h: int, out_w: int) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").resize((out_w, out_h), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


def load_texture_db(
    list_files: Sequence[str],
    *,
    height: int = 384,
    width: int = 512,
    use_native: bool = True,
) -> np.ndarray:
    """Load all textures named by one or more list files into a canonical atlas
    ``(T, 2*height, 2*width, 3) uint8`` (RGB).

    Mirrors TextureCollection's startup behavior (cpp:117-149): every file is
    loaded eagerly; a missing/unreadable list file raises. The reference's
    R<->B swap (cpp:129-131) is NOT applied here — channel order is an output
    adapter concern (DataGenConfig.channel_order).
    """
    paths = []
    for lf in list_files:
        with open(lf, "r") as f:
            for line in f:
                line = line.strip()
                if line:
                    paths.append(line)
    if not paths:
        raise ValueError(f"No texture paths found in {list_files!r}")
    return load_images(paths, height=height, width=width, use_native=use_native)


def load_images(
    paths: Iterable[str], *, height: int = 384, width: int = 512, use_native: bool = True
) -> np.ndarray:
    paths = list(paths)
    oh, ow = 2 * height, 2 * width
    if use_native and native_loader_available():
        out = load_images_native(paths, oh, ow)
        if out is not None:
            return out
    imgs = [_decode_pil(p, oh, ow) for p in paths]
    total_mb = sum(i.nbytes for i in imgs) / (1024 * 1024)
    print(f"Loaded {len(imgs)} textures with a total size of {total_mb:.0f} MB.")
    return np.stack(imgs)


def procedural_atlas(
    n_textures: int = 32, *, height: int = 384, width: int = 512, seed: int = 0
) -> np.ndarray:
    """Synthetic texture bank for tests and benchmarks: band-limited colored
    noise with random low-frequency structure — no files required. (The
    reference has no equivalent; it always needs a user texture DB.)"""
    rng = np.random.default_rng(seed)
    oh, ow = 2 * height, 2 * width
    out = np.empty((n_textures, oh, ow, 3), np.uint8)
    yy, xx = np.mgrid[0:oh, 0:ow].astype(np.float32)
    for t in range(n_textures):
        img = np.zeros((oh, ow, 3), np.float32)
        for _ in range(6):
            fx, fy = rng.uniform(0.002, 0.08, 2)
            ph = rng.uniform(0, 2 * np.pi, 2)
            amp = rng.uniform(20, 70)
            wave = np.sin(2 * np.pi * (fx * xx + fy * yy) + ph[0]) * np.cos(
                2 * np.pi * (fy * xx - fx * yy) + ph[1]
            )
            img += amp * wave[..., None] * rng.uniform(0.2, 1.0, 3)
        img += rng.uniform(60, 180, 3)
        out[t] = np.clip(img, 0, 255).astype(np.uint8)
    return out


def atlas_for_config(cfg: DataGenConfig) -> np.ndarray:
    """Atlas from the config's texture databases, or a procedural bank when
    none are configured (handy for smoke tests and benchmarking)."""
    if cfg.texture_dbases:
        return load_texture_db(
            cfg.texture_dbases, height=cfg.height, width=cfg.width
        )
    return procedural_atlas(height=cfg.height, width=cfg.width)
