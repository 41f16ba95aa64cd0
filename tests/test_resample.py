"""Banded two-pass affine resampler (ops/pallas_resample.py).

Pins: (a) the Mosaic kernel computes exactly the documented two-pass
arithmetic (vs an independent jnp restatement), (b) the two-pass result
equals true bilinear sampling exactly for shear-free transforms and stays
bounded for rotations, (c) reflect padding matches texture._wrap_indices
semantics. Kernel runs in interpret mode on the CPU backend; the on-device
check lives in tools/check_pallas_tpu.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from flowgen.ops import affine, texture
from flowgen.ops.pallas_resample import (
    affine_resample_pallas,
    max_row_span,
    pack_padded_slab,
    pack_rgb_i32,
    reflect_pad,
    scan_tiles_pass1,
    scan_tiles_pass2,
    two_pass_reference,
)

H, W = 160, 256
MY = MX = 32
WH, WW = 64, 128


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (H, W, 3)).astype(np.uint8)


@pytest.fixture(scope="module")
def slab(img):
    return pack_padded_slab(img, MY, MX)


def _t_slab(rot, zoom, tx, ty):
    t_img = affine.chain(
        affine.translation(tx, ty),
        affine.conjugate_about(affine.rotation(rot), W / 2, H / 2),
        affine.scaling(1.0 / zoom),
    )
    return t_img, affine.compose(t_img, affine.translation(MX, MY))


CASES = [
    ("identity", 0.0, 1.0, 0.0, 0.0),
    ("trans", 0.0, 1.0, 7.3, -4.2),
    ("zoom", 0.0, 1.25, 3.0, 2.0),
    ("rot10", np.deg2rad(10), 1.1, 5.0, -3.0),
    ("rot-20", np.deg2rad(-20), 0.85, -6.0, 8.0),
]


@pytest.mark.parametrize("name,rot,zoom,tx,ty", CASES)
def test_kernel_matches_reference(slab, name, rot, zoom, tx, ty):
    _, t = _t_slab(rot, zoom, tx, ty)
    P = max_row_span(WH, WW, 0.4, 1.4)
    out_k = affine_resample_pallas(
        slab, t, 4, 8, wh=WH, ww=WW, P=P,
        x_tiles_scan=scan_tiles_pass1(1.5, 0.5, P),
        y_tiles_scan=scan_tiles_pass2(0.5, 1.5, 128),
        interpret=True,
    )
    out_r = two_pass_reference(slab, t, 4, 8, WH, WW, P)
    # identical arithmetic up to f32 fma/reassociation jitter (sub-LSB of u8)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r), atol=2e-2)


@pytest.mark.parametrize("name,rot,zoom,tx,ty", CASES)
def test_vs_direct_bilinear(img, slab, name, rot, zoom, tx, ty):
    t_img, t = _t_slab(rot, zoom, tx, ty)
    P = max_row_span(WH, WW, 0.4, 1.4)
    out_k = affine_resample_pallas(
        slab, t, 4, 8, wh=WH, ww=WW, P=P,
        x_tiles_scan=scan_tiles_pass1(1.5, 0.5, P),
        y_tiles_scan=scan_tiles_pass2(0.5, 1.5, 128),
        interpret=True,
    )
    yy, xx = np.meshgrid(
        8 + np.arange(WH, dtype=np.float32),
        4 + np.arange(WW, dtype=np.float32),
        indexing="ij",
    )
    sx, sy = affine.apply_xy(
        jnp.asarray(t_img, jnp.float32), jnp.asarray(xx), jnp.asarray(yy)
    )
    direct = texture.sample_bilinear(
        jnp.asarray(img, jnp.float32), sx, sy, wrap="reflect"
    )
    d = np.abs(np.asarray(out_k) - np.asarray(direct))
    if rot == 0.0:
        # shear-free: the decomposition IS bilinear sampling
        assert d.max() < 1e-2, name
    else:
        # skewed interpolation deviation, bounded even on pure noise (the
        # worst case); natural textures sit far below this
        assert d.mean() < 8.0 and d.max() < 64.0, (name, d.mean(), d.max())


def test_quad_gather_reflect_exact():
    """The one-gather quad sampler reproduces exact reflect-bilinear
    (sample_bilinear) EVERYWHERE — including deep mirrored folds, where the
    continuous pre-fold (texture._reflect_fold_coord) flips the
    interpolation direction. In-range coordinates are bit-identical (the
    fold is bypassed there); folded ones differ only by lerp-direction
    rounding (lerp(a,b,1-f) vs lerp(b,a,f))."""
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.integers(0, 255, (23, 31, 3)).astype(np.float32))
    quad = texture.make_quad(img)

    xs = np.concatenate([
        rng.uniform(-200, 200, 3000),
        np.arange(-70, 70, 0.5),          # exact integers and halves
        np.array([30.0, 30.9999, 31.0001, -0.0001, -0.5, -1.0, 61.5, 62.0]),
    ]).astype(np.float32)
    ys = np.concatenate([
        rng.uniform(-150, 150, 3000),
        np.arange(-47, 46.9, 0.335),
        np.full(8, 5.25),
    ]).astype(np.float32)
    n = min(len(xs), len(ys))
    xs, ys = jnp.asarray(xs[:n]), jnp.asarray(ys[:n])

    exact = np.asarray(texture.sample_bilinear(img, xs, ys, wrap="reflect"))
    fast = np.asarray(texture.sample_bilinear_quad(quad, xs, ys,
                                                   wrap="reflect"))
    np.testing.assert_allclose(fast, exact, atol=5e-3)

    xi = jnp.asarray(rng.uniform(0, 30.0, 1000).astype(np.float32))
    yi = jnp.asarray(rng.uniform(0, 22.0, 1000).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(texture.sample_bilinear_quad(quad, xi, yi, wrap="reflect")),
        np.asarray(texture.sample_bilinear(img, xi, yi, wrap="reflect")),
    )


def test_reflect_pad_matches_wrap_indices():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 255, (8, 11)).astype(np.int32)
    padded = np.asarray(reflect_pad(jnp.asarray(a), 5, 7))
    for dy in range(-5, 13):
        for dx in range(-7, 18):
            yi = int(texture._wrap_indices(jnp.int32(dy), 8, "reflect"))
            xi = int(texture._wrap_indices(jnp.int32(dx), 11, "reflect"))
            assert padded[dy + 5, dx + 7] == a[yi, xi]


def test_pack_rgb_roundtrip():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (4, 6, 3)).astype(np.uint8)
    packed = np.asarray(pack_rgb_i32(jnp.asarray(img)))
    assert ((packed >> 16) & 0xFF == img[..., 0]).all()
    assert ((packed >> 8) & 0xFF == img[..., 1]).all()
    assert (packed & 0xFF == img[..., 2]).all()
