"""TPU renderer vs scalar NumPy oracle (flowgen/reference_check/oracle.py).

The oracle follows the reference's literal order of operations (materialized
2Wx2H background, whole-texture warps, per-object masks, sequential blits);
the TPU renderer uses composed affines, windows, and quad gathers. Agreement
validates those restructurings. Flow is analytic in both paths and must agree
tightly; images go through different resampling chains and are compared
statistically."""

import jax.numpy as jnp
import numpy as np
import pytest

import flowgen
from flowgen.compose.render import prepare_atlas, render_sample
from flowgen.params.sampler import sample_scene
from flowgen.random.streams import root_key, sample_key
from flowgen.reference_check import oracle

W, H = 192, 160


@pytest.mark.parametrize("mode", [1, 5, 7])
def test_renderer_matches_oracle(mode):
    cfg = flowgen.DataGenConfig(mode=mode, batch_size=1, width=W, height=H)
    atlas_np = flowgen.procedural_atlas(3, height=H, width=W)
    scene = sample_scene(
        sample_key(root_key(7), 0), cfg.mode_spec, width=W, height=H
    )
    out = render_sample(scene, prepare_atlas(jnp.asarray(atlas_np)), cfg)

    o_img0, o_img1, o_flow = oracle.render_scene_oracle(
        oracle.scene_to_numpy(scene), atlas_np, W, H
    )

    flow = np.asarray(out.flow0)
    dflow = np.abs(flow - o_flow).max(-1)
    # Flow is analytic in both implementations. Differences can only come from
    # f32-vs-f64 rounding flipping boundary pixels' binary coverage.
    assert np.median(dflow) < 1e-3
    assert (dflow > 0.1).mean() < 0.01

    img0 = np.asarray(out.image0)
    img1 = np.asarray(out.image1)
    # Background resampling differs (one composed gather vs three chained
    # resamples), so compare with a generous pixel tolerance but require
    # near-exact agreement for the bulk of the image.
    assert np.median(np.abs(img0 - o_img0)) <= 2.0
    assert np.median(np.abs(img1 - o_img1)) <= 3.0
    assert (np.abs(img0 - o_img0).mean(-1) < 8).mean() > 0.8


def test_renderer_matches_oracle_mode9():
    """Nonrigid parity: the oracle follows the reference literally (per-
    component u8-mask resampling through the inverse field, two-stage texture
    warp, x2-upscaled background field); the TPU path warps the combined
    coverage in one stage. Flow gating uses the UNWARPED frame-0 mask in
    both, so flow parity stays tight; images absorb the warp-order and
    double-resample deviations statistically."""
    from flowgen.warpfields import generator as warpgen

    cfg = flowgen.DataGenConfig(mode=9, batch_size=1, width=W, height=H)
    atlas_np = flowgen.procedural_atlas(3, height=H, width=W)
    bank = warpgen.make_warp_bank(root_key(2), jnp.int32(0), cfg)
    n_slots = warpgen.bank_size(cfg)
    # Seed chosen so the scene contains several deforming objects.
    scene = sample_scene(
        sample_key(root_key(11), 0), cfg.mode_spec, width=W, height=H,
        n_warp_slots=n_slots,
    )
    assert np.asarray(scene.objects.warp & scene.objects.valid).sum() >= 2

    out = render_sample(
        scene, prepare_atlas(jnp.asarray(atlas_np)), cfg, warp_bank=bank
    )
    bank_np = {
        "flow": np.asarray(bank.flow), "iflow": np.asarray(bank.iflow)
    }
    o_img0, o_img1, o_flow = oracle.render_scene_oracle(
        oracle.scene_to_numpy(scene), atlas_np, W, H, warp_bank=bank_np
    )

    flow = np.asarray(out.flow0)
    dflow = np.abs(flow - o_flow).max(-1)
    assert np.isfinite(flow).all()
    assert np.median(dflow) < 1e-3
    assert (dflow > 0.1).mean() < 0.01

    img1 = np.asarray(out.image1)
    assert np.median(np.abs(img1 - o_img1)) <= 3.0
    assert (np.abs(img1 - o_img1).mean(-1) < 8).mean() > 0.7
