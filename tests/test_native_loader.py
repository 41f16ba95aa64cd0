"""Native C++ texture loader tests (flowgen/texture_io/native): format
decoding, parallel load, PIL-fallback equivalence."""

import os

import numpy as np
import pytest

from flowgen import texture_io
from flowgen.texture_io import native
from flowgen.utils import flow_io


@pytest.fixture(scope="module")
def have_native():
    if not native.native_loader_available():
        pytest.skip("native loader not built")
    return True


def _mk_textures(tmp_path, n=4):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        img = rng.integers(0, 255, (37 + i, 53 + i, 3), dtype=np.uint8)
        if i % 2 == 0:
            p = str(tmp_path / f"t{i}.ppm")
            flow_io.write_ppm(p, img)
        else:
            p = str(tmp_path / f"t{i}.png")
            Image.fromarray(img).save(p)
        paths.append(p)
    return paths


def test_native_matches_pil(have_native, tmp_path):
    paths = _mk_textures(tmp_path)
    a, ok = native.load_images_native(paths, 48, 64)
    assert a.shape == (4, 48, 64, 3) and ok.all()
    b = texture_io.load_images(paths, height=24, width=32, use_native=False)
    c, _ = native.load_images_native(paths, 48, 64)
    np.testing.assert_array_equal(a, c)  # deterministic
    # Same canonical size as the PIL path and near-identical resampling.
    assert b.shape == a.shape
    assert np.abs(a.astype(int) - b.astype(int)).mean() < 2.0


def test_native_reports_unsupported(have_native, tmp_path):
    bad = str(tmp_path / "bad.xyz")
    with open(bad, "wb") as f:
        f.write(b"not an image at all..........")
    _, ok = native.load_images_native([bad], 16, 16)
    assert not ok[0]


def test_load_texture_db_uses_native(have_native, tmp_path):
    paths = _mk_textures(tmp_path)
    listfile = str(tmp_path / "db.txt")
    with open(listfile, "w") as f:
        f.write("\n".join(paths))
    atlas = texture_io.load_texture_db([listfile], height=24, width=32)
    assert atlas.shape == (4, 48, 64, 3)


def test_native_jpeg_matches_pil(have_native, tmp_path):
    """Baseline JPEG decode (native jpeg.cpp) vs PIL/libjpeg on the same
    bytes: both implement T.81 annex F exactly up to IDCT rounding and
    chroma upsampling (replication here, fancy upsampling in libjpeg), so
    pixels agree to a few levels on smooth content."""
    from PIL import Image

    yy, xx = np.mgrid[0:64, 0:96].astype(np.float32)
    smooth = np.stack(
        [128 + 90 * np.sin(xx / 19), 128 + 90 * np.cos(yy / 13),
         128 + 60 * np.sin((xx + yy) / 29)], axis=-1,
    ).clip(0, 255).astype(np.uint8)

    cases = [
        ("q95_420", dict(quality=95)),
        ("q85_444", dict(quality=85, subsampling=0)),
        ("q95_422", dict(quality=95, subsampling=1)),
    ]
    for name, kw in cases:
        p = str(tmp_path / f"{name}.jpg")
        Image.fromarray(smooth).save(p, **kw)
        out, ok = native.load_images_native([p], 64, 96)
        assert ok[0], name
        ref = np.asarray(Image.open(p).convert("RGB")).astype(int)
        d = np.abs(out[0].astype(int) - ref)
        assert d.mean() < 2.0, (name, d.mean())
        assert np.median(d) <= 1.0, name

    # Grayscale single-component scan.
    pg = str(tmp_path / "gray.jpg")
    Image.fromarray(smooth[..., 0], mode="L").save(pg, quality=92)
    out, _ = native.load_images_native([pg], 64, 96)
    ref = np.asarray(Image.open(pg).convert("RGB")).astype(int)
    assert np.abs(out[0].astype(int) - ref).mean() < 2.0

    # Restart markers (DRI), if this PIL exposes the knob.
    try:
        pr = str(tmp_path / "restart.jpg")
        Image.fromarray(smooth).save(pr, quality=90, restart_marker_blocks=4)
        out, _ = native.load_images_native([pr], 64, 96)
        ref = np.asarray(Image.open(pr).convert("RGB")).astype(int)
        assert np.abs(out[0].astype(int) - ref).mean() < 2.0
    except TypeError:
        pass


def test_native_jpeg_progressive_matches_pil(have_native, tmp_path):
    """Progressive JPEG (SOF2: spectral selection + successive approximation,
    jpeg.cpp annex-G scans) decodes natively and matches PIL/libjpeg up to
    the documented chroma-upsampling difference; at 4:4:4 (no upsampling)
    the decode is coefficient-exact (max deviation = IDCT rounding)."""
    from PIL import Image

    yy, xx = np.mgrid[0:67, 0:93].astype(np.float32)
    smooth = np.stack(
        [128 + 90 * np.sin(xx / 19), 128 + 90 * np.cos(yy / 13),
         128 + 60 * np.sin((xx + yy) / 29)], axis=-1,
    ).clip(0, 255).astype(np.uint8)
    noisy = np.random.default_rng(3).integers(0, 255, (64, 64, 3), np.uint8)

    cases = [
        ("p_q90_420", smooth, dict(progressive=True, quality=90), 2.0),
        ("p_q95_444", smooth,
         dict(progressive=True, quality=95, subsampling=0), 0.2),
        ("p_q75_422", smooth,
         dict(progressive=True, quality=75, subsampling=1), 2.0),
        # 4:4:4 noisy content: any scan-decode bug explodes this bound.
        ("p_noisy_444", noisy,
         dict(progressive=True, quality=85, subsampling=0), 0.2),
    ]
    for name, img, kw, bound in cases:
        p = str(tmp_path / f"{name}.jpg")
        Image.fromarray(img).save(p, **kw)
        out, ok = native.load_images_native([p], img.shape[0], img.shape[1])
        assert ok[0], name
        ref = np.asarray(Image.open(p).convert("RGB")).astype(int)
        d = np.abs(out[0].astype(int) - ref)
        assert d.mean() < bound, (name, d.mean())

    # Grayscale progressive + restart markers inside progressive scans.
    pg = str(tmp_path / "pgray.jpg")
    Image.fromarray(smooth[..., 0], mode="L").save(
        pg, progressive=True, quality=92)
    out, ok = native.load_images_native([pg], 67, 93)
    assert ok[0]
    ref = np.asarray(Image.open(pg).convert("RGB")).astype(int)
    assert np.abs(out[0].astype(int) - ref).mean() < 0.2
    try:
        pr = str(tmp_path / "prestart.jpg")
        Image.fromarray(smooth).save(
            pr, progressive=True, quality=90, restart_marker_blocks=4)
        out, ok = native.load_images_native([pr], 67, 93)
        assert ok[0]
        ref = np.asarray(Image.open(pr).convert("RGB")).astype(int)
        assert np.abs(out[0].astype(int) - ref).mean() < 2.0
    except TypeError:
        pass


def test_native_unsupported_falls_back_per_file(have_native, tmp_path,
                                                monkeypatch):
    """One file the native tier can't decode (TIFF here) must not forfeit
    the threaded decode of the rest: only THAT file goes through PIL
    (per-file fallback, loader.cpp fg_load_images ok[]), and its pixels
    come out PIL-exact."""
    from PIL import Image

    paths = _mk_textures(tmp_path)
    img = np.random.default_rng(1).integers(0, 255, (32, 32, 3), np.uint8)
    p = str(tmp_path / "odd.tiff")
    Image.fromarray(img).save(p)
    paths.insert(2, p)

    _, ok = native.load_images_native(paths, 32, 32)
    assert ok.sum() == len(paths) - 1 and not ok[2]

    calls = []
    real = texture_io._decode_pil
    monkeypatch.setattr(
        texture_io, "_decode_pil",
        lambda q, h, w: (calls.append(q), real(q, h, w))[1],
    )
    out = texture_io.load_images(paths, height=16, width=16)
    assert calls == [p]   # PIL touched only the straggler
    np.testing.assert_array_equal(out[2], real(p, 32, 32))
