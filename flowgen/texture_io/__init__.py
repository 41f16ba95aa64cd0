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
from typing import Iterable, NamedTuple, Sequence

import numpy as np

from ..config import DataGenConfig
from .native import native_loader_available, load_images_native


class TextureDB(NamedTuple):
    """Texture bank preserving heterogeneous source resolutions.

    The reference keeps every image at native size and its crop geometry
    depends on it (Texture::getRandomizedCrop, cpp:87-109: crop when the
    source is at least as large as the request, whole-image resize
    otherwise). Fields:

    * ``canonical`` (T, 2H, 2W, 3) u8 — sources resized to the canonical
      grid (what a plain-array atlas is); used by the windowed fallback path.
    * ``sources``   (T, maxH, maxW, 3) u8 — zero-padded native images.
    * ``sizes``     (T, 2) i32 — native (h, w) per source.
    * ``obj_tex``   (T, H, W, 3) u8 — the reference-exact object texture per
      source (center crop, or whole-image resize for small sources —
      getRandomizedCrop with default args, cpp:1149-1150).

    The fused render path consumes sources/sizes/obj_tex for exact per-source
    field-of-view; a plain (T, 2H, 2W, 3) array remains accepted everywhere
    and behaves as an all-canonical DB.
    """

    canonical: np.ndarray
    sources: np.ndarray
    sizes: np.ndarray
    obj_tex: np.ndarray


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
    native_fov: bool = False,
):
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
    return load_images(
        paths, height=height, width=width, use_native=use_native,
        native_fov=native_fov,
    )


def load_images(
    paths: Iterable[str], *, height: int = 384, width: int = 512,
    use_native: bool = True, native_fov: bool = False,
):
    paths = list(paths)
    oh, ow = 2 * height, 2 * width
    if not native_fov:
        if use_native and native_loader_available():
            res = load_images_native(paths, oh, ow)
            if res is not None:
                out, ok = res
                # Per-file fallback: PIL-decode only the stragglers the
                # native tier can't handle (TIFF, 12-bit JPEG, ...) —
                # the reference decodes everything serially via CImg
                # (DataGenerator.cpp:117-149); one exotic file must not
                # forfeit the threaded decode of the rest.
                for i in np.flatnonzero(~ok):
                    out[i] = _decode_pil(paths[i], oh, ow)
                return out
        imgs = [_decode_pil(p, oh, ow) for p in paths]
        total_mb = sum(i.nbytes for i in imgs) / (1024 * 1024)
        print(
            f"Loaded {len(imgs)} textures with a total size of "
            f"{total_mb:.0f} MB."
        )
        return np.stack(imgs)

    from PIL import Image

    natives = []
    for p in paths:
        with Image.open(p) as im:
            natives.append(np.asarray(im.convert("RGB"), dtype=np.uint8))
    return build_texture_db(natives, height=height, width=width)


def build_texture_db(natives, *, height: int, width: int) -> TextureDB:
    """Assemble a :class:`TextureDB` from native-resolution RGB arrays."""
    from PIL import Image

    oh, ow = 2 * height, 2 * width

    def resize(img, w, h):
        return np.asarray(
            Image.fromarray(img).resize((w, h), Image.BILINEAR), np.uint8
        )

    def resize_linear(img, w, h):
        # Point-sampled bilinear (CImg resize interpolation 3 semantics) —
        # the reference's small-source fallback, kept literal so the oracle
        # and the fused path agree on it.
        oy, ox = np.mgrid[0:h, 0:w].astype(np.float64)
        u = (ox + 0.5) * img.shape[1] / w - 0.5
        v = (oy + 0.5) * img.shape[0] / h - 0.5
        x0 = np.clip(np.floor(u).astype(np.int64), 0, img.shape[1] - 1)
        y0 = np.clip(np.floor(v).astype(np.int64), 0, img.shape[0] - 1)
        x1 = np.minimum(x0 + 1, img.shape[1] - 1)
        y1 = np.minimum(y0 + 1, img.shape[0] - 1)
        fx = (u - np.floor(u))[..., None]
        fy = (v - np.floor(v))[..., None]
        im = img.astype(np.float64)
        out = (
            (im[y0, x0] * (1 - fx) + im[y0, x1] * fx) * (1 - fy)
            + (im[y1, x0] * (1 - fx) + im[y1, x1] * fx) * fy
        )
        return np.clip(np.round(out), 0, 255).astype(np.uint8)

    max_h = max(i.shape[0] for i in natives)
    max_w = max(i.shape[1] for i in natives)
    T = len(natives)
    sources = np.zeros((T, max_h, max_w, 3), np.uint8)
    sizes = np.zeros((T, 2), np.int32)
    canonical = np.zeros((T, oh, ow, 3), np.uint8)
    obj_tex = np.zeros((T, height, width, 3), np.uint8)
    for t, img in enumerate(natives):
        h, w = img.shape[:2]
        sources[t, :h, :w] = img
        sizes[t] = (h, w)
        canonical[t] = resize(img, ow, oh)
        if h >= height and w >= width:
            y0, x0 = h // 2 - height // 2, w // 2 - width // 2
            obj_tex[t] = img[y0 : y0 + height, x0 : x0 + width]
        else:
            # Small-source fallback: whole-image resize (cpp:104-108).
            obj_tex[t] = resize_linear(img, width, height)
    total_mb = sources.nbytes / (1024 * 1024)
    print(
        f"Loaded {T} textures (native FOV) with a total size of "
        f"{total_mb:.0f} MB."
    )
    return TextureDB(
        canonical=canonical, sources=sources, sizes=sizes, obj_tex=obj_tex
    )


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


def atlas_for_config(cfg: DataGenConfig):
    """Atlas from the config's texture databases, or a procedural bank when
    none are configured (handy for smoke tests and benchmarking)."""
    if cfg.texture_dbases:
        return load_texture_db(
            cfg.texture_dbases, height=cfg.height, width=cfg.width,
            native_fov=cfg.native_texture_fov,
        )
    return procedural_atlas(height=cfg.height, width=cfg.width)
