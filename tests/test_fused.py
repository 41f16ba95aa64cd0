"""Scene-megakernel path (compose/fused.py + ops/pallas_scene.py) vs the
windowed XLA path, run in Pallas interpreter mode on CPU.

Flow and frame-0 must match exactly (identical exact-area coverage math and
blend arithmetic); frame-1 textures go through the banded two-pass resampler
whose deviations from the quad-gather path are (a) true AGG reflect in
mirrored wrap regions — where the quad path's +1-neighbor deviation applies —
and (b) interpolation along the shear direction under rotation, so frame 1 is
compared statistically. On-device equivalence: tools/check_pallas_tpu.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flowgen
from flowgen.compose.fused import render_batch_fused
from flowgen.compose.render import prepare_atlas, render_batch
from flowgen.ops import texture
from flowgen.ops.pallas_scene import fused_eligible, prepare_slabs
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
    scenes = sample_scene_batch(
        root_key(seed), jnp.arange(batch), cfg, n_warp_slots=1
    )
    return cfg, quad, slabs, scenes


@pytest.mark.parametrize("mode", [1, 5, 7])
def test_fused_matches_windowed(mode):
    cfg, quad, slabs, scenes = _setup(mode)
    ref = render_batch(scenes, quad, cfg)
    out = render_batch_fused(scenes, quad, slabs, cfg, interpret=True)

    # Flow: identical coverage math -> f32-rounding agreement only.
    df = np.abs(np.asarray(out[2]) - np.asarray(ref[2]))
    assert df.max() < 1e-3
    # Frame 0: identical texture (direct window slice) and blend.
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    # Frame 1: statistical bound only — the bulk of the differences are the
    # QUAD path's unflipped +1 neighbor in mirrored wrap regions (objects
    # with large translations sample far outside the crop), not resampler
    # error; see test_fused_frame1_matches_true_reflect for the tight check.
    d1 = np.abs(np.asarray(out[1]) - np.asarray(ref[1]))
    assert np.median(d1) <= 1.0
    assert (d1.mean(-1) < 8).mean() > 0.85


def test_fused_frame1_matches_true_reflect():
    """Against a TRUE-reflect restatement of the old path (exact bilinear from
    the raw texture), translation-only frame-1 sampling is exact: the only
    systematic quad-path deviation is its unflipped +1 neighbor in mirrored
    regions, which the slab materializes correctly."""
    cfg, quad, slabs, scenes = _setup(1)

    orig = texture.sample_bilinear_quad

    def true_reflect(quadimg, x, y, wrap="reflect", channels=3):
        return texture.sample_bilinear(
            quadimg[..., :3].astype(jnp.float32), x, y, wrap=wrap
        )

    texture.sample_bilinear_quad = true_reflect
    try:
        ref = render_batch(scenes, quad, cfg)
    finally:
        texture.sample_bilinear_quad = orig
    out = render_batch_fused(scenes, quad, slabs, cfg, interpret=True)
    d1 = np.abs(np.asarray(out[1]) - np.asarray(ref[1]))
    assert d1.max() <= 1.0 + 1e-5  # round knife-edges only


def test_fused_inverse_flow():
    cfg, quad, slabs, scenes = _setup(7, inverse=True)
    ref = render_batch(scenes, quad, cfg)
    out = render_batch_fused(scenes, quad, slabs, cfg, interpret=True)
    df = np.abs(np.asarray(out[3]) - np.asarray(ref[3]))
    assert df.max() < 1e-3


def test_eligibility_gates():
    spec7 = flowgen.DataGenConfig(mode=7).mode_spec
    spec9 = flowgen.DataGenConfig(mode=9).mode_spec
    spec13 = flowgen.DataGenConfig(mode=13).mode_spec
    assert fused_eligible(spec7, 384, 512)
    assert not fused_eligible(spec9, 384, 512)   # nonrigid warps
    assert not fused_eligible(spec13, 384, 512)  # rotations beyond 45 deg
    assert not fused_eligible(spec7, 384, 500)   # lane-unaligned width


def test_generate_batch_dispatch():
    """use_fused_path is off on CPU (auto) and for ineligible modes."""
    from flowgen.pipeline.generator import use_fused_path

    assert not use_fused_path(flowgen.DataGenConfig(mode=7))  # cpu backend
    cfg = flowgen.DataGenConfig(mode=7, use_pallas="always")
    assert use_fused_path(cfg)
    assert not use_fused_path(
        flowgen.DataGenConfig(mode=9, use_pallas="always")
    )
