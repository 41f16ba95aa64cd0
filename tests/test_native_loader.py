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
    a = native.load_images_native(paths, 48, 64)
    assert a is not None and a.shape == (4, 48, 64, 3)
    b = texture_io.load_images(paths, height=24, width=32, use_native=False)
    c = native.load_images_native(paths, 48, 64)
    np.testing.assert_array_equal(a, c)  # deterministic
    # Same canonical size as the PIL path and near-identical resampling.
    assert b.shape == a.shape
    assert np.abs(a.astype(int) - b.astype(int)).mean() < 2.0


def test_native_reports_unsupported(have_native, tmp_path):
    bad = str(tmp_path / "bad.xyz")
    with open(bad, "wb") as f:
        f.write(b"not an image at all..........")
    assert native.load_images_native([bad], 16, 16) is None


def test_load_texture_db_uses_native(have_native, tmp_path):
    paths = _mk_textures(tmp_path)
    listfile = str(tmp_path / "db.txt")
    with open(listfile, "w") as f:
        f.write("\n".join(paths))
    atlas = texture_io.load_texture_db([listfile], height=24, width=32)
    assert atlas.shape == (4, 48, 64, 3)
