"""Tests for the prototxt adapter, flow/image IO, texture IO, and profiling
utilities."""

import os

import numpy as np
import pytest

import flowgen
from flowgen.pipeline import prototxt
from flowgen.utils import flow_io
from flowgen import texture_io

EXAMPLE = """
layer {
  name: "gen"
  type: "DataGeneration"
  top: "first-image"
  top: "second-image"
  top: "optical-flow-groundtruth"
  data_param {
    batch_size: 8
    prefetch: 40   # pool depth
  }
  data_generation_param {
    mode: 7
    texture_dbases: "/tmp/db1.txt"
    texture_dbases: "/tmp/db2.txt"
    first_level_threads: 8
    second_level_threads: 3
  }
}
"""


def test_prototxt_roundtrip():
    cfg = prototxt.config_from_prototxt(EXAMPLE)
    assert cfg.mode == 7
    assert cfg.batch_size == 8
    assert cfg.prefetch == 40
    assert cfg.texture_dbases == ("/tmp/db1.txt", "/tmp/db2.txt")
    # Caffe-compatible output convention by default when coming from prototxt.
    assert cfg.layout == "nchw" and cfg.channel_order == "bgr"
    # overrides win
    cfg2 = prototxt.config_from_prototxt(EXAMPLE, mode=4, layout="nhwc")
    assert cfg2.mode == 4 and cfg2.layout == "nhwc"


def test_prototxt_rejects_missing_layer():
    with pytest.raises(ValueError):
        prototxt.config_from_prototxt("layer { type: \"Data\" }")


def test_flo_roundtrip(tmp_path):
    flow = np.random.default_rng(0).normal(size=(24, 32, 2)).astype(np.float32)
    p = str(tmp_path / "a.flo")
    flow_io.write_flo(p, flow)
    np.testing.assert_array_equal(flow_io.read_flo(p), flow)


def test_pfm_roundtrip(tmp_path):
    img = np.random.default_rng(1).random((16, 20, 3)).astype(np.float32)
    p = str(tmp_path / "a.pfm")
    flow_io.write_pfm(p, img)
    np.testing.assert_allclose(flow_io.read_pfm(p), img, rtol=1e-6)


def test_ppm_roundtrip(tmp_path):
    img = np.random.default_rng(2).integers(0, 255, (10, 12, 3), dtype=np.uint8)
    p = str(tmp_path / "a.ppm")
    flow_io.write_ppm(p, img)
    np.testing.assert_array_equal(flow_io.read_ppm(p), img)


def test_flow_to_color_shapes():
    f = np.zeros((8, 8, 2), np.float32)
    f[..., 0] = 3.0
    rgb = flow_io.flow_to_color(f)
    assert rgb.shape == (8, 8, 3) and rgb.dtype == np.uint8


def test_texture_db_loading(tmp_path):
    # Build a tiny texture DB (PPM files + list file) and load it at a small
    # canonical size — mirrors TextureCollection's list-file format
    # (DataGenerator.cpp:117-135).
    rng = np.random.default_rng(3)
    paths = []
    for i in range(3):
        img = rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
        p = str(tmp_path / f"tex{i}.ppm")
        flow_io.write_ppm(p, img)
        paths.append(p)
    listfile = str(tmp_path / "db.txt")
    with open(listfile, "w") as f:
        f.write("\n".join(paths) + "\n")
    atlas = texture_io.load_texture_db([listfile], height=24, width=32)
    assert atlas.shape == (3, 48, 64, 3)
    assert atlas.dtype == np.uint8


def test_texture_db_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        texture_io.load_texture_db([str(tmp_path / "nope.txt")])


def test_procedural_atlas_properties():
    a = flowgen.procedural_atlas(4, height=32, width=40, seed=1)
    assert a.shape == (4, 64, 80, 3)
    assert a.std() > 10  # non-trivial content
    b = flowgen.procedural_atlas(4, height=32, width=40, seed=1)
    np.testing.assert_array_equal(a, b)  # deterministic
