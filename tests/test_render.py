"""End-to-end render tests (flowgen/compose/render.py): photometric
flow/image consistency, background motion correctness, output adapters.
Small resolutions keep CPU compile times reasonable."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import flowgen
from flowgen.ops import affine, texture
from flowgen.params.sampler import sample_scene
from flowgen.random.streams import root_key, sample_key

W, H = 192, 160


def _gen(cfg, step=0, seed=0, n_tex=4):
    atlas = flowgen.procedural_atlas(n_tex, height=cfg.height, width=cfg.width)
    fn = flowgen.make_generate_fn(cfg)
    out = fn(root_key(seed), jnp.int32(step), jnp.asarray(atlas, jnp.float32))
    return {k: np.asarray(v) for k, v in out.items()}


def _photometric_err(out, cfg):
    """Median |image0(p) - image1(p + flow(p))| over in-bounds pixels. Flow at
    occluded pixels carries the occluder's motion (reference semantics,
    RenderCore::computeFlowImage cpp:801-818), which still warps consistently."""
    i0, i1, f = out["image0"], out["image1"], out["flow0"]
    errs = []
    for b in range(i0.shape[0]):
        yy, xx = np.mgrid[0 : cfg.height, 0 : cfg.width].astype(np.float32)
        sx = xx + f[b, ..., 0]
        sy = yy + f[b, ..., 1]
        w = np.asarray(
            texture.sample_bilinear(
                jnp.asarray(i1[b]), jnp.asarray(sx), jnp.asarray(sy), wrap="clamp"
            )
        )
        inb = (sx >= 0) & (sx < cfg.width - 1) & (sy >= 0) & (sy < cfg.height - 1)
        errs.append(np.median(np.abs(w - i0[b]).mean(-1)[inb]))
    return float(np.mean(errs))


@pytest.mark.parametrize("mode", [1, 5, 7])
def test_photometric_consistency(mode):
    cfg = flowgen.DataGenConfig(mode=mode, batch_size=2, width=W, height=H)
    out = _gen(cfg)
    assert _photometric_err(out, cfg) < 8.0


def test_output_ranges_and_shapes():
    cfg = flowgen.DataGenConfig(mode=4, batch_size=2, width=W, height=H)
    out = _gen(cfg)
    assert out["image0"].shape == (2, H, W, 3)
    assert out["flow0"].shape == (2, H, W, 2)
    assert out["image0"].min() >= 0.0 and out["image0"].max() <= 255.0
    # images are u8-quantized floats (reference copies u8 frames to float,
    # cpp:1229-1245)
    assert np.allclose(out["image0"], np.round(out["image0"]))
    assert np.abs(out["flow0"]).max() < 600.0


def test_background_flow_matches_blueprint():
    # Pixels not covered by any object must carry the conjugated background
    # motion's displacement (cpp:692-718 via the center-conjugation identity).
    cfg = flowgen.DataGenConfig(mode=5, batch_size=1, width=W, height=H)
    out = _gen(cfg, seed=11)
    scene = sample_scene(
        sample_key(root_key(11), 0), cfg.mode_spec, width=W, height=H
    )
    m = affine.conjugate_about(scene.background.motion, W / 2.0, H / 2.0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    fx, fy = affine.apply_xy(m, jnp.asarray(xx), jnp.asarray(yy))
    pred = np.stack([np.asarray(fx) - xx, np.asarray(fy) - yy], -1)
    match = np.abs(out["flow0"][0] - pred).max(-1) < 1e-3
    # a sizable fraction of the frame is background
    assert match.mean() > 0.2


def test_layout_and_channel_adapters():
    cfg = flowgen.DataGenConfig(
        mode=1, batch_size=1, width=W, height=H, layout="nchw", channel_order="bgr"
    )
    out = _gen(cfg)
    assert out["image0"].shape == (1, 3, H, W)
    assert out["flow0"].shape == (1, 2, H, W)
    rgb = _gen(dataclasses.replace(cfg, layout="nhwc", channel_order="rgb"))
    np.testing.assert_allclose(
        out["image0"][0].transpose(1, 2, 0)[..., ::-1], rgb["image0"][0]
    )


def test_no_antialiasing_mode():
    cfg = flowgen.DataGenConfig(
        mode=4, batch_size=1, width=W, height=H, use_antialiasing=False
    )
    out = _gen(cfg)
    assert np.isfinite(out["image0"]).all()


def test_inverse_flow_output():
    cfg = flowgen.DataGenConfig(
        mode=1, batch_size=1, width=W, height=H, compute_inverse_flow=True
    )
    out = _gen(cfg)
    assert "flow1" in out and out["flow1"].shape == (1, H, W, 2)
    # For translation-only scenes, forward and inverse flows negate each other
    # wherever the same object covers the pixel in both frames.
    f0, f1 = out["flow0"][0], out["flow1"][0]
    close = np.abs(f0 + f1).max(-1) < 1e-2
    assert close.mean() > 0.5


@pytest.mark.parametrize("mode", [1, 7])
def test_windowed_equals_fullframe(mode):
    # Bbox-windowed evaluation must be bit-identical to full-frame evaluation
    # (the window provably contains every pixel the object can touch). This
    # pins the WINDOWED renderer's culling optimization, so force it — under
    # the default render_impl="fused", windowed=True would route to the
    # megakernel (a different, non-comparable renderer) while windowed=False
    # cannot.
    cfg = flowgen.DataGenConfig(mode=mode, batch_size=2, width=256, height=192,
                                render_impl="windowed")
    a = _gen(cfg, seed=4)
    b_cfg = dataclasses.replace(cfg, windowed=False)
    b = _gen(b_cfg, seed=4)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_determinism_same_step():
    cfg = flowgen.DataGenConfig(mode=7, batch_size=1, width=W, height=H, seed=5)
    a = _gen(cfg, step=3, seed=5)
    b = _gen(cfg, step=3, seed=5)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    c = _gen(cfg, step=4, seed=5)
    assert not np.array_equal(a["image0"], c["image0"])
