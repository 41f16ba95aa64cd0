"""Scene-megakernel path (compose/fused.py + ops/pallas_scene.py) vs the
windowed XLA path, run in Pallas interpreter mode on CPU.

Flow must match the windowed path exactly (identical exact-area coverage and
flow math). Frames are compared against a TRUE-reflect restatement of the
windowed path (exact bilinear from the raw texture): the megakernel's slabs
materialize AGG's reflect wrap exactly, and since round 4 the quad-gather
path is reflect-exact too (ops/texture._reflect_fold_coord), so the ideal
differs from the windowed path only by lerp-direction rounding. The fused
path agrees with the ideal reference to +-1 intensity level (round
knife-edges and sub-level two-pass shear only).
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
    quadrant_needed,
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
    slabs = prepare_slabs(
        quad[..., :3], H, W, quadrant=quadrant_needed(cfg.mode_spec)
    )
    bgslabs = prepare_bg_slabs(quad[..., :3])
    scenes = sample_scene_batch(
        root_key(seed), jnp.arange(batch), cfg, n_warp_slots=1
    )
    src_hw = (atlas.shape[1], atlas.shape[2])
    return cfg, quad, slabs, bgslabs, src_hw, scenes


def _true_reflect_render(scenes, quad, cfg, bank=None):
    """The windowed path with quad gathers replaced by exact bilinear reflect
    sampling — the ideal both paths approximate."""
    orig = texture.sample_bilinear_quad

    def true_reflect(quadimg, x, y, wrap="reflect", channels=3):
        return texture.sample_bilinear(
            quadimg[..., :3].astype(jnp.float32), x, y, wrap=wrap
        )

    texture.sample_bilinear_quad = true_reflect
    try:
        return render_batch(scenes, quad, cfg, bank)
    finally:
        texture.sample_bilinear_quad = orig


def _find_mode9_scenes(cfg, n_slots, batch=2, need_obj=2, need_bg=1):
    """Deterministically scan seeds for a batch exercising both the object
    and the background deformation paths."""
    for seed in range(40):
        scenes = sample_scene_batch(
            root_key(seed), jnp.arange(batch), cfg, n_warp_slots=n_slots
        )
        objw = int(np.asarray(scenes.objects.warp & scenes.objects.valid).sum())
        bgw = int(np.asarray(scenes.background.warp).sum())
        if objw >= need_obj and bgw >= need_bg:
            return scenes
    raise AssertionError("no seed with enough deforming objects/background")


@pytest.mark.parametrize("mode", [1, 5, 7, 11, 13])
def test_fused_matches_ideal(mode):
    cfg, quad, slabs, bgslabs, src_hw, scenes = _setup(mode)
    ref = render_batch(scenes, quad, cfg)
    ideal = _true_reflect_render(scenes, quad, cfg)
    out = render_batch_fused(scenes, slabs, bgslabs, src_hw, cfg,
                             interpret=True)

    # Flow: identical coverage math in both paths -> f32 rounding only.
    df = np.abs(np.asarray(out[2]) - np.asarray(ref[2]))
    assert df.max() < 1e-3
    # Frames vs the exact-bilinear ideal: the two-pass shear residual is
    # sub-level per resample, but an AA-edge pixel BLENDS an object and a
    # background resample — two independent sub-level errors plus the final
    # round can reach 2 intensity levels at isolated knife-edge pixels.
    # Quadrant modes (11/13) leave residual rotations up to the full 45-deg
    # conditioning bound where the shear interpolation is at its worst: on a
    # strong texture gradient isolated pixels reach 4 levels (frame 1 only;
    # flow stays exact) — measured 20 px >= 3 and 8 px >= 4 over 2x96x128x3
    # at seed 3, all inside one object at 39.8-deg residual rotation.
    quad_mode = quadrant_needed(cfg.mode_spec)
    lvl, tail = (4.0, 2e-3) if quad_mode else (2.0, 1e-4)
    for i in (0, 1):
        d = np.abs(np.asarray(out[i]) - np.asarray(ideal[i]))
        assert d.max() <= lvl + 1e-5, f"frame{i} max {d.max()}"
        assert (d >= 2.0).mean() < tail, f"frame{i} 2-level tail"
        if quad_mode:
            assert (d >= 4.0).mean() < 2e-4, f"frame{i} 4-level tail"
        # Quadrant modes keep most objects heavily rotated, so the sub-level
        # two-pass shear blur covers whole object interiors: ~10% of pixels
        # differ by one rounding level (>=2 stays in the tail above).
        assert (d > 0.5).mean() < (0.12 if quad_mode else 0.05)


def test_fused_inverse_flow():
    cfg, quad, slabs, bgslabs, src_hw, scenes = _setup(7, inverse=True)
    ref = render_batch(scenes, quad, cfg)
    out = render_batch_fused(scenes, slabs, bgslabs, src_hw, cfg,
                             interpret=True)
    df = np.abs(np.asarray(out[3]) - np.asarray(ref[3]))
    assert df.max() < 1e-3


def test_fused_mode9_matches_windowed():
    """Nonrigid scenes, everything in-kernel: object deformation AND
    background deformation (separable displacement warps over
    epoch-precomputed aux planes). Frame 0 matches the exact-bilinear ideal
    to +-1 level (the background now two-pass-resamples in-kernel); flow
    matches except sub-percent warped-mask boundary flips; frame 1 absorbs
    the one-stage-vs-two-stage texture warp difference (the fused two-stage
    form is the reference's literal order, cpp:341-346)."""
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
    scenes = _find_mode9_scenes(cfg, warpgen.bank_size(cfg))

    ref = render_batch(scenes, quad, cfg, bank)
    ideal = _true_reflect_render(scenes, quad, cfg, bank)
    out = render_batch_fused(
        scenes, slabs, bgslabs, (atlas.shape[1], atlas.shape[2]), cfg,
        interpret=True, warp_aux=aux,
    )
    d0 = np.abs(np.asarray(out[0]) - np.asarray(ideal[0]))
    assert d0.max() <= 1.0 + 1e-5
    assert (d0 > 0.5).mean() < 0.02
    df = np.abs(np.asarray(out[2]) - np.asarray(ref[2])).max(-1)
    assert np.median(df) < 1e-3
    assert (df > 0.1).mean() < 0.01
    # Frame 1 compares against the IDEAL (exact bilinear), not the windowed
    # path: the in-kernel displaced background/objects land far closer to it
    # than the quad-gather warp chain does (measured means 0.04/0.53 levels
    # vs windowed's 2.5/8.0 on the same scenes — the fused path is the more
    # faithful one; the two paths legitimately diverge from each other).
    d1 = np.abs(np.asarray(out[1]) - np.asarray(ideal[1])).mean(-1)
    assert np.median(d1) < 0.5
    assert d1.mean() < 1.0
    assert (d1 >= 8).mean() < 1e-3


def test_fused_mode9_inverse_flow():
    """Mode 9 + compute_inverse_flow through the megakernel: the inverse
    flow of a deforming object is the inverse affine masked by the DISPLACED
    binary mask — must match the windowed path's semantics."""
    from flowgen.warpfields import generator as warpgen

    cfg = flowgen.DataGenConfig(
        mode=9, batch_size=2, width=W, height=H, use_pallas="never",
        compute_inverse_flow=True,
    )
    atlas = jnp.asarray(
        flowgen.procedural_atlas(3, height=H, width=W), jnp.float32
    )
    quad = jax.jit(prepare_atlas)(atlas)
    slabs = prepare_slabs(quad[..., :3], H, W)
    bgslabs = prepare_bg_slabs(quad[..., :3])
    bank = warpgen.make_warp_bank(root_key(0), jnp.int32(0), cfg)
    aux = warpgen.make_warp_aux(bank)
    scenes = _find_mode9_scenes(cfg, warpgen.bank_size(cfg), need_obj=1,
                                need_bg=0)

    ref = render_batch(scenes, quad, cfg, bank)
    out = render_batch_fused(
        scenes, slabs, bgslabs, (atlas.shape[1], atlas.shape[2]), cfg,
        interpret=True, warp_aux=aux,
    )
    # Inverse flow: affine math identical; the displaced-mask boundary may
    # flip a sub-percent of pixels (two displacement-warp formulations).
    di = np.abs(np.asarray(out[3]) - np.asarray(ref[3])).max(-1)
    assert np.median(di) < 1e-3
    assert (di > 0.1).mean() < 0.01


def test_fused_texture_split():
    """Frame-1 texture sub-tiling (ps.texture_split == 2) for envelopes that
    exceed the slab fold margin at full windows. Before sub-tiling, mode 13
    at >= 256-wide frames crashed outright (pass-1 row span 1200 > slab
    height) and mode 11 could read fold-invalid rows for extreme samples
    (footprint radius 310 > SLAB_MARGIN 256). Flow must stay exact vs the
    windowed path; frames match the exact-bilinear ideal up to the quadrant
    modes' documented 45-deg shear-conditioning extremes (measured at
    192x256 seed 3: frame0 max 1 level; frame1 isolated pixels to 8/22
    levels on < 1e-3 of pixels, modes 13/11)."""
    from flowgen.ops.pallas_scene import resample_params, texture_split

    Wb, Hb = 256, 192
    spec11 = flowgen.DataGenConfig(mode=11).mode_spec
    spec13 = flowgen.DataGenConfig(mode=13).mode_spec
    assert texture_split(spec11, Hb, Wb) == 2
    assert texture_split(spec13, Hb, Wb) == 2
    assert resample_params(spec13, Hb, Wb)[0] == 608  # one sub-window's span

    cfg = flowgen.DataGenConfig(
        mode=13, batch_size=2, width=Wb, height=Hb, use_pallas="never"
    )
    atlas = jnp.asarray(
        flowgen.procedural_atlas(3, height=Hb, width=Wb), jnp.float32
    )
    quad = jax.jit(prepare_atlas)(atlas)
    slabs = prepare_slabs(
        quad[..., :3], Hb, Wb, quadrant=quadrant_needed(cfg.mode_spec)
    )
    bgslabs = prepare_bg_slabs(quad[..., :3])
    scenes = sample_scene_batch(root_key(3), jnp.arange(2), cfg, n_warp_slots=1)
    ref = render_batch(scenes, quad, cfg)
    ideal = _true_reflect_render(scenes, quad, cfg)
    out = render_batch_fused(
        scenes, slabs, bgslabs, (atlas.shape[1], atlas.shape[2]), cfg,
        interpret=True,
    )
    df = np.abs(np.asarray(out[2]) - np.asarray(ref[2]))
    assert df.max() < 1e-3
    d0 = np.abs(np.asarray(out[0], np.float32) - np.asarray(ideal[0], np.float32))
    assert d0.max() <= 2.0 + 1e-5
    d1 = np.abs(np.asarray(out[1], np.float32) - np.asarray(ideal[1], np.float32))
    assert (d1 >= 2.0).mean() < 2e-3
    assert (d1 >= 4.0).mean() < 2e-4
    assert (d1 > 0.5).mean() < 0.08
    assert d1.max() <= 32.0


def test_column_window_sizing():
    """Static column-window spans of the staged slab row blocks
    (resample_params cw_obj/cw_bg): the window must cover every source
    column pass 1 can touch — |A|max*ww + |B|max*rows plus lerp and
    128-snap slack — and at production size the background window must be
    a real cut vs the full canonical slab row (the largest DMA term)."""
    import math

    from flowgen.ops.pallas_scene import (
        bg_envelope, mode_envelope, resample_params,
    )

    for mode in (1, 7, 9, 11, 13):
        spec = flowgen.DataGenConfig(mode=mode).mode_spec
        P, PBG, _, _, _, _, tsp, cwo, cwb = resample_params(spec, 384, 512)
        rot_o, inv_o = mode_envelope(spec, 384, 512)
        rot_o = min(rot_o, math.pi / 4)
        rot_b, inv_b = bg_envelope(spec)
        need_o = (inv_o / math.cos(rot_o)) * (256 // tsp) \
            + math.tan(rot_o) * P + 4 + 129
        need_b = (inv_b / math.cos(rot_b)) * 256 + math.tan(rot_b) * PBG \
            + 4 + 129
        assert cwo % 128 == 0 and cwb % 128 == 0
        assert cwo >= need_o and cwb >= need_b
    # Production-size background cut: canonical 2Hx2W source slab is 1536
    # wide; mode 7's background envelope needs far less per window.
    spec7 = flowgen.DataGenConfig(mode=7).mode_spec
    cwb7 = resample_params(spec7, 384, 512)[8]
    SWb = ((2 * 512 + 2 * 256 + 127) // 128) * 128
    assert cwb7 <= SWb // 2


def test_eligibility_gates():
    spec7 = flowgen.DataGenConfig(mode=7).mode_spec
    spec9 = flowgen.DataGenConfig(mode=9).mode_spec
    spec11 = flowgen.DataGenConfig(mode=11).mode_spec
    spec13 = flowgen.DataGenConfig(mode=13).mode_spec
    assert fused_eligible(spec7, 384, 512)
    assert fused_eligible(spec9, 384, 512)       # nonrigid: in-kernel warps
    assert fused_eligible(spec9, 384, 512, inverse_flow=True)
    # Rotations beyond 45 deg route through quadrant-factored slabs.
    assert fused_eligible(spec11, 384, 512)
    assert fused_eligible(spec13, 384, 512)
    assert quadrant_needed(spec11) and quadrant_needed(spec13)
    assert not quadrant_needed(spec7)
    assert not fused_eligible(spec7, 384, 500)   # lane-unaligned width


def test_generate_batch_dispatch():
    """render_impl dial: "fused" (default) selects the megakernel on EVERY
    backend (the image-content contract), "windowed" forces the XLA
    fallback, "auto" restores the legacy backend-keyed routing (off on
    CPU)."""
    from flowgen.pipeline.generator import use_fused_path

    assert use_fused_path(flowgen.DataGenConfig(mode=7))  # fused everywhere
    assert not use_fused_path(
        flowgen.DataGenConfig(mode=7, render_impl="windowed")
    )
    assert not use_fused_path(
        flowgen.DataGenConfig(mode=7, render_impl="auto")  # cpu backend
    )
    assert not use_fused_path(
        flowgen.DataGenConfig(mode=7, use_pallas="never")
    )
    # Ineligible frame dims fall back regardless of the dial.
    assert not use_fused_path(
        flowgen.DataGenConfig(mode=7, width=500, height=384)
    )
    cfg = flowgen.DataGenConfig(mode=7, use_pallas="always")
    assert use_fused_path(cfg)
    assert use_fused_path(flowgen.DataGenConfig(mode=9, use_pallas="always"))
    assert use_fused_path(
        flowgen.DataGenConfig(
            mode=9, use_pallas="always", compute_inverse_flow=True
        )
    )
    assert use_fused_path(flowgen.DataGenConfig(mode=11, use_pallas="always"))
    assert use_fused_path(flowgen.DataGenConfig(mode=13, use_pallas="always"))


def test_envelope_guard():
    """compose/fused.envelope_violations: zero for built-in in-envelope
    motion, trips on motion beyond the mode's declared ranges (the
    mis-declared-ModeSpec failure the static kernel sizing cannot see), and
    stays zero when quadrant factoring absorbs a large rotation (mode 11)."""
    from flowgen.compose import fused
    from flowgen.ops import affine

    cfg7, _, _, _, _, scenes7 = _setup(7)
    assert int(fused.envelope_violations(scenes7, cfg7)) == 0

    def inject_rotation(scenes, deg):
        """Overwrite every object's motion with a rotation about the frame
        center (keeps on-screen objects on-screen)."""
        th = float(np.deg2rad(deg))
        m = affine.conjugate_about(affine.rotation(th), W / 2.0, H / 2.0)
        K = scenes.objects.valid.shape[-1]
        B = scenes.objects.valid.shape[0]
        mb = jnp.broadcast_to(m, (B, K, 2, 3))
        ib = jnp.broadcast_to(
            affine.invert(m), (B, K, 2, 3)
        )
        return scenes._replace(
            objects=scenes.objects._replace(motion=mb, motion_inv=ib)
        )

    # Mode 7 declares ~+-21 deg of total rotation; 60 deg exceeds the static
    # pass-1 sizing (no quadrant factoring for this mode) -> violations.
    bad = inject_rotation(scenes7, 60.0)
    assert int(fused.envelope_violations(bad, cfg7)) > 0
    # Within the declared envelope: still clean.
    ok = inject_rotation(scenes7, 10.0)
    assert int(fused.envelope_violations(ok, cfg7)) == 0

    # Mode 11 quadrant-factors: the same 60 deg leaves a 30-deg residual,
    # within the 45-deg static sizing -> no violations.
    cfg11, _, _, _, _, scenes11 = _setup(11)
    bad11 = inject_rotation(scenes11, 60.0)
    assert int(fused.envelope_violations(bad11, cfg11)) == 0
    # ... but an anisotropic shear no rotation+scale mode can produce
    # (|b| >> |d|) still trips it after factoring.
    shear = jnp.asarray([[1.0, 4.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    B, K = scenes11.objects.valid.shape
    sheared = scenes11._replace(
        objects=scenes11.objects._replace(
            motion_inv=jnp.broadcast_to(shear, (B, K, 2, 3))
        )
    )
    assert int(fused.envelope_violations(sheared, cfg11)) > 0
