"""Scene-megakernel path (compose/fused.py + ops/pallas_scene.py) vs the
windowed XLA path, run in Pallas interpreter mode on CPU.

Flow must match the windowed path exactly (identical exact-area coverage and
flow math). Frames are compared against a TRUE-reflect restatement of the
windowed path (exact bilinear from the raw texture): the megakernel's slabs
materialize AGG's reflect wrap exactly, whereas the quad-gather path carries
a documented +1-neighbor deviation inside mirrored regions — so the fused
path is the MORE faithful one, and agrees with the ideal reference to +-1
intensity level (round knife-edges and sub-level two-pass shear only).
On-device equivalence: tools/check_pallas_tpu.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flowgen
from flowgen.compose.fused import render_batch_fused
from flowgen.compose.render import prepare_atlas, render_batch
from flowgen.ops import texture
from flowgen.ops.pallas_scene import (
    fused_eligible,
    prepare_bg_slabs,
    prepare_slabs,
)
from flowgen.params.sampler import sample_scene_batch
from flowgen.random.streams import root_key

W, H = 128, 96


def _setup(mode, seed=3, batch=2, inverse=False):
    cfg = flowgen.DataGenConfig(
        mode=mode, batch_size=batch, width=W, height=H, use_pallas="never",
        compute_inverse_flow=inverse,
    )
    atlas = jnp.asarray(
        flowgen.procedural_atlas(3, height=H, width=W), jnp.float32
    )
    quad = jax.jit(prepare_atlas)(atlas)
    slabs = prepare_slabs(quad[..., :3], H, W)
    bgslabs = prepare_bg_slabs(quad[..., :3])
    scenes = sample_scene_batch(
        root_key(seed), jnp.arange(batch), cfg, n_warp_slots=1
    )
    src_hw = (atlas.shape[1], atlas.shape[2])
    return cfg, quad, slabs, bgslabs, src_hw, scenes


def _true_reflect_render(scenes, quad, cfg):
    """The windowed path with quad gathers replaced by exact bilinear reflect
    sampling — the ideal both paths approximate."""
    orig = texture.sample_bilinear_quad

    def true_reflect(quadimg, x, y, wrap="reflect", channels=3):
        return texture.sample_bilinear(
            quadimg[..., :3].astype(jnp.float32), x, y, wrap=wrap
        )

    texture.sample_bilinear_quad = true_reflect
    try:
        return render_batch(scenes, quad, cfg)
    finally:
        texture.sample_bilinear_quad = orig


@pytest.mark.parametrize("mode", [1, 5, 7])
def test_fused_matches_ideal(mode):
    cfg, quad, slabs, bgslabs, src_hw, scenes = _setup(mode)
    ref = render_batch(scenes, quad, cfg)
    ideal = _true_reflect_render(scenes, quad, cfg)
    out = render_batch_fused(scenes, slabs, bgslabs, src_hw, cfg,
                             interpret=True)

    # Flow: identical coverage math in both paths -> f32 rounding only.
    df = np.abs(np.asarray(out[2]) - np.asarray(ref[2]))
    assert df.max() < 1e-3
    # Frames vs the exact-bilinear ideal: +-1 level (round knife-edges and
    # sub-level two-pass shear).
    for i in (0, 1):
        d = np.abs(np.asarray(out[i]) - np.asarray(ideal[i]))
        assert d.max() <= 1.0 + 1e-5, f"frame{i} max {d.max()}"
        assert (d > 0.5).mean() < 0.02


def test_fused_inverse_flow():
    cfg, quad, slabs, bgslabs, src_hw, scenes = _setup(7, inverse=True)
    ref = render_batch(scenes, quad, cfg)
    out = render_batch_fused(scenes, slabs, bgslabs, src_hw, cfg,
                             interpret=True)
    df = np.abs(np.asarray(out[3]) - np.asarray(ref[3]))
    assert df.max() < 1e-3


def test_fused_mode9_matches_windowed():
    """Nonrigid scenes: object deformation in-kernel (separable displacement
    warp over epoch-precomputed aux fields), background via the XLA warp
    path. Frame 0 is bit-exact (shared background, rigid frame-0 masks);
    flow matches except sub-percent warped-mask boundary flips; frame 1
    absorbs the one-stage-vs-two-stage texture warp difference (the fused
    two-stage form is the reference's literal order, cpp:341-346, and
    measures CLOSER to the oracle than the windowed path)."""
    from flowgen.warpfields import generator as warpgen

    cfg = flowgen.DataGenConfig(
        mode=9, batch_size=2, width=W, height=H, use_pallas="never"
    )
    atlas = jnp.asarray(
        flowgen.procedural_atlas(3, height=H, width=W), jnp.float32
    )
    quad = jax.jit(prepare_atlas)(atlas)
    slabs = prepare_slabs(quad[..., :3], H, W)
    bgslabs = prepare_bg_slabs(quad[..., :3])
    bank = warpgen.make_warp_bank(root_key(0), jnp.int32(0), cfg)
    aux = warpgen.make_warp_aux(bank)
    scenes = sample_scene_batch(
        root_key(11), jnp.arange(2), cfg, n_warp_slots=warpgen.bank_size(cfg)
    )
    assert np.asarray(scenes.objects.warp & scenes.objects.valid).sum() >= 2

    ref = render_batch(scenes, quad, cfg, bank)
    out = render_batch_fused(
        scenes, slabs, bgslabs, (atlas.shape[1], atlas.shape[2]), cfg,
        interpret=True, quad_atlas=quad, warp_bank=bank, warp_aux=aux,
    )
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    df = np.abs(np.asarray(out[2]) - np.asarray(ref[2])).max(-1)
    assert np.median(df) < 1e-3
    assert (df > 0.1).mean() < 0.005
    d1 = np.abs(np.asarray(out[1]) - np.asarray(ref[1]))
    assert np.median(d1) <= 2.0
    assert (d1.mean(-1) < 8).mean() > 0.8


def test_eligibility_gates():
    spec7 = flowgen.DataGenConfig(mode=7).mode_spec
    spec9 = flowgen.DataGenConfig(mode=9).mode_spec
    spec13 = flowgen.DataGenConfig(mode=13).mode_spec
    assert fused_eligible(spec7, 384, 512)
    assert fused_eligible(spec9, 384, 512)       # nonrigid: in-kernel warps
    assert not fused_eligible(spec9, 384, 512, inverse_flow=True)
    assert not fused_eligible(spec13, 384, 512)  # rotations beyond 45 deg
    assert not fused_eligible(spec7, 384, 500)   # lane-unaligned width


def test_generate_batch_dispatch():
    """use_fused_path is off on CPU (auto) and for ineligible modes."""
    from flowgen.pipeline.generator import use_fused_path

    assert not use_fused_path(flowgen.DataGenConfig(mode=7))  # cpu backend
    cfg = flowgen.DataGenConfig(mode=7, use_pallas="always")
    assert use_fused_path(cfg)
    assert use_fused_path(flowgen.DataGenConfig(mode=9, use_pallas="always"))
    assert not use_fused_path(
        flowgen.DataGenConfig(
            mode=9, use_pallas="always", compute_inverse_flow=True
        )
    )
