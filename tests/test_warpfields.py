"""Warp-field tests (flowgen/warpfields/*): displacer semantics, binary-
doubling integration, forward/inverse consistency, mode-9 end-to-end
(reference src/caffe/WarpFields.cpp)."""

import jax.numpy as jnp
import numpy as np

import flowgen
from flowgen.ops import texture
from flowgen.random.streams import root_key
from flowgen.warpfields import fields, generator as warpgen

W, H = 128, 96


def test_hex_grid_geometry():
    x, y = fields.hex_grid_centers(1536)
    x, y = np.asarray(x), np.asarray(y)
    # spacing 200, isosceles rows (cpp:572-579): 7 cols x 9 rows
    assert x.shape[0] == 63
    assert x.min() >= 100 and x.max() <= 1536
    # odd rows offset by half spacing
    assert (np.unique(y).size) == 9


def test_supports():
    # Supports are peak-normalized influence masks (WarpFields.cpp:31-115):
    # value 1 at the center, falling off per the shape.
    xx, yy = np.meshgrid(np.arange(64, dtype=np.float32),
                         np.arange(64, dtype=np.float32))
    x, y = jnp.asarray(xx), jnp.asarray(yy)

    c = np.asarray(fields.constant_support(x, y, factor=0.75))
    np.testing.assert_allclose(c, 0.75)

    g1 = np.asarray(fields.gaussian1d_support(x, y, 32.0, 32.0, 8.0))
    assert g1[32, 32] == 1.0
    # isotropy + exact falloff: exp(-d^2 / 2 sigma^2)
    np.testing.assert_allclose(g1[32, 40], np.exp(-64.0 / 128.0), rtol=1e-5)
    np.testing.assert_allclose(g1[40, 32], g1[32, 40], rtol=1e-6)

    # Gaussian2D with equal sigmas reduces to Gaussian1D for any angle.
    g2 = np.asarray(fields.gaussian2d_support(x, y, 32.0, 32.0, 8.0, 8.0, 0.7))
    np.testing.assert_allclose(g2, g1, rtol=1e-5, atol=1e-7)

    # Anisotropy rotates with the angle: at angle 0 the x-axis uses sigma_x.
    ga = np.asarray(fields.gaussian2d_support(x, y, 32.0, 32.0, 16.0, 4.0, 0.0))
    assert ga[32, 40] > ga[40, 32]  # wide along x, narrow along y


def test_self_compose_translation_doubles():
    # A constant translation field composes to 2^iters * t (exact for
    # constant fields, the degenerate case of the doubling scheme cpp:360-384).
    t = 1e-4
    field = jnp.full((32, 32, 2), t)
    out = np.asarray(fields.self_compose(field, iters=10))
    inner = out[8:24, 8:24]  # away from the flagged boundary
    np.testing.assert_allclose(inner, t * (2**10), rtol=1e-4)


def test_self_compose_flags_oob_as_nan():
    field = jnp.full((16, 16, 2), 1.0)  # leaves bounds almost immediately
    out = np.asarray(fields.self_compose(field, iters=5))
    assert np.isnan(out).any()


def test_clamp_near_zeros():
    f = jnp.array([[[1e-4, -5e-4], [2e-3, 0.5]]])
    out = np.asarray(fields.clamp_near_zeros(f))
    np.testing.assert_allclose(out, [[[0.0, 0.0], [2e-3, 0.5]]])


def test_flow_iflow_inversion():
    # f(x) + if(x + f(x)) ~ 0: the hierarchical composition must keep forward
    # and inverse fields consistent (the property the reference buys with its
    # 2^17 diffeomorphism composition, h:256-261).
    bank = warpgen.make_warp_bank(
        root_key(0), jnp.int32(0), flowgen.DataGenConfig(mode=9, width=W, height=H)
    )
    f = np.nan_to_num(np.asarray(bank.flow[0]))
    i = np.nan_to_num(np.asarray(bank.iflow[0]))
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    samp = np.asarray(
        texture.sample_bilinear(
            jnp.asarray(i), xx + f[..., 0], yy + f[..., 1], wrap="clamp"
        )
    )
    res = np.abs(f + samp)
    assert res.mean() < 0.05
    assert np.median(res) < 0.02


def test_bank_magnitudes_and_shape():
    cfg = flowgen.DataGenConfig(mode=9, width=W, height=H)
    bank = warpgen.make_warp_bank(root_key(1), jnp.int32(2), cfg)
    n = warpgen.bank_size(cfg)
    assert bank.flow.shape == (n, H, W, 2)
    mags = np.abs(np.nan_to_num(np.asarray(bank.flow)))
    # Tiny elementary displacements x 2^17: nonrigid but bounded deformation.
    assert 0.5 < mags.mean() < 20.0
    assert mags.max() < 120.0


def test_bank_impl_is_config_not_backend():
    """Mode-9 content contract (one implementation = one stream, like the
    reference's single WarpFields.cpp:337-437 path): the default bank is the
    Pallas composition on EVERY backend (interpret mode here on CPU) —
    bit-identical to forcing impl="pallas" — and the "xla" stream is reached
    only through the explicit cfg dial, never by backend autodetection."""
    cfg = flowgen.DataGenConfig(mode=9, width=W, height=H)
    bank_default = warpgen.make_warp_bank(root_key(5), jnp.int32(0), cfg)
    bank_pallas = warpgen.make_warp_bank(root_key(5), jnp.int32(0), cfg,
                                         impl="pallas")
    np.testing.assert_array_equal(
        np.asarray(bank_default.flow), np.asarray(bank_pallas.flow)
    )
    np.testing.assert_array_equal(
        np.asarray(bank_default.iflow), np.asarray(bank_pallas.iflow)
    )
    assert cfg.warp_bank_impl == "pallas"

    cfg_xla = flowgen.DataGenConfig(mode=9, width=W, height=H,
                                    warp_bank_impl="xla")
    bank_xla = warpgen.make_warp_bank(root_key(5), jnp.int32(0), cfg_xla)
    d = np.abs(np.nan_to_num(np.asarray(bank_xla.flow))
               - np.nan_to_num(np.asarray(bank_default.flow)))
    # Different stream (the dial is loud), but the same distribution family:
    # sub-2% of the field magnitude (tests/test_pallas_fields.py pins this).
    assert d.max() > 0.0


def test_mode9_end_to_end():
    cfg = flowgen.DataGenConfig(mode=9, batch_size=2, width=W, height=H)
    atlas = flowgen.procedural_atlas(3, height=H, width=W)
    out = flowgen.make_generate_fn(cfg)(
        root_key(1), jnp.int32(0), jnp.asarray(atlas, jnp.float32)
    )
    f = np.asarray(out["flow0"])
    assert np.isfinite(f).all()
    assert np.isfinite(np.asarray(out["image0"])).all()
    assert np.abs(f).max() < 600.0


def test_crop_diversity_across_epoch():
    """Reference-grade warp-crop diversity (VERDICT r2 #3): with the default
    bank sizing, the average number of times one crop serves a warped entity
    across a bank epoch stays <= 10 (the reference's continuously-produced
    fields serve each crop ~3x, WarpFields.cpp:489, 516-538), and the slot
    assignment actually spreads across the bank."""
    from flowgen.params.sampler import sample_scene_batch

    cfg = flowgen.DataGenConfig(mode=9, batch_size=32, width=W, height=H)
    n_slots = warpgen.bank_size(cfg)
    assert cfg.warp_fields_per_batch >= 2  # the diversity dial is ON

    draws = []
    for step in range(cfg.warp_bank_reuse_steps):
        scenes = sample_scene_batch(
            root_key(0),
            jnp.arange(step * 32, (step + 1) * 32),
            cfg,
            n_warp_slots=n_slots,
        )
        ow = np.asarray(scenes.objects.warp & scenes.objects.valid)
        slots = np.asarray(scenes.objects.warp_slot)[ow]
        draws.append(slots)
        bgw = np.asarray(scenes.background.warp)
        draws.append(np.asarray(scenes.background.warp_slot)[bgw])
    draws = np.concatenate(draws)

    reuse = draws.size / n_slots
    assert reuse <= 10.0, f"mean crop reuse {reuse:.1f} > 10"
    # Uniform assignment: a healthy fraction of the bank is actually used
    # (coupon-collector expectation at this draw count is ~1-exp(-reuse)).
    frac_used = np.unique(draws).size / n_slots
    assert frac_used > 0.8


def test_half_lattice_composition_error_bounded():
    """ROADMAP deviation #8, quantified: the production schedule runs the
    first 16 of 17 doublings on a half-resolution lattice. Pin its error
    against the full-resolution composition of the SAME elementary field —
    the deviation must stay a small fraction of the field magnitude (the
    fields are sigma~50 px smooth, so the half lattice resolves them)."""
    from flowgen.random.streams import stream_key, Stream

    s = 384
    key = stream_key(root_key(21), Stream.WARP_FIELD, 0)
    # make_big_field draws the displacer grid from `key` and composes with
    # the half-lattice schedule; the reference composition below re-draws
    # the same grid and runs all 17 doublings at full resolution.
    half_flow, _ = fields.make_big_field(key, s)
    grid = fields.sample_displacer_grid(key, s)
    f0 = fields.elementary_field(grid, s, inverse=False)
    ref = fields.self_compose(f0, iters=fields.COMPOSE_ITERS)

    rn, hn = np.asarray(ref), np.asarray(half_flow)
    nan_r, nan_h = np.isnan(rn[..., 0]), np.isnan(hn[..., 0])
    # Flag boundaries may shift by the lattice difference only slightly.
    assert (nan_r != nan_h).mean() < 0.02
    both = ~nan_r & ~nan_h
    m = s // 4  # the bank only crops inside this margin
    both[:m] = both[-m:] = both[:, :m] = both[:, -m:] = False
    err = np.abs(rn - hn)[both]
    mag = np.abs(rn[both]).max()
    assert mag > 1.0
    assert np.median(err) < 0.03 * mag
    assert np.quantile(err, 0.99) < 0.15 * mag


def test_warp_oob_nan_matches_oracle_flags():
    """warp_oob="nan" (reference parity: signaling NaNs at flagged warp-field
    pixels propagate into emitted flow, WarpFields.cpp:389-398 via
    getPointFlow cpp:398-406): NaNs in the production output land exactly on
    the pixels whose forward-field bilinear footprint the oracle flags.
    Stock banks carry no flags (crop margins >= W/4 vs sub-3 px composed
    displacement), so flags are injected into every slot."""
    from flowgen.params.sampler import sample_scene
    from flowgen.pipeline.generator import generate_batch
    from flowgen.random.streams import sample_key
    from flowgen.reference_check import oracle

    root = root_key(11)  # scene with several deforming objects (test_oracle)
    atlas_np = flowgen.procedural_atlas(3, height=H, width=W)
    cfg_nan = flowgen.DataGenConfig(
        mode=9, batch_size=1, width=W, height=H, warp_oob="nan"
    )
    bank = warpgen.make_warp_bank(root, jnp.int32(0), cfg_nan)
    assert not np.isnan(np.asarray(bank.flow)).any()  # policy already encoded
    # Rebuild a NaN-carrying bank: decode the sentinel back to NaN, then
    # plant an interior flagged block in every slot.
    flow_nan = np.asarray(
        jnp.where(bank.flow >= warpgen.OOB_FLOW_THRESH, jnp.nan, bank.flow)
    ).copy()
    # Flag the whole interior (4-px margin): every emitted-flow pixel of a
    # deforming object whose moved position stays in-frame then samples a
    # flagged field pixel, regardless of where the scene's objects landed.
    flow_nan[:, 4:-4, 4:-4, :] = np.nan
    bank_nan = bank._replace(flow=jnp.asarray(flow_nan))

    out = generate_batch(
        root, jnp.int32(0), jnp.asarray(atlas_np, jnp.float32), cfg=cfg_nan,
        warp_bank=warpgen.apply_oob_policy(bank_nan, "nan"),
    )
    flow = np.asarray(out["flow0"][0])

    n_slots = warpgen.bank_size(cfg_nan)
    scene = sample_scene(
        sample_key(root, 0), cfg_nan.mode_spec, width=W, height=H,
        n_warp_slots=n_slots,
    )
    assert np.asarray(scene.objects.warp & scene.objects.valid).sum() >= 2
    _, _, o_flow = oracle.render_scene_oracle(
        oracle.scene_to_numpy(scene), atlas_np, W, H,
        warp_bank={"flow": flow_nan, "iflow": np.asarray(bank_nan.iflow)},
        warp_oob="nan",
    )

    nan_prod = np.isnan(flow)
    nan_orc = np.isnan(o_flow)
    assert nan_orc.sum() > 100          # the planted flags were sampled
    assert nan_prod.sum() > 100
    # Footprints agree pixel-exactly up to f32-vs-f64 coordinate rounding at
    # footprint boundaries (and zero-weight corners, where IEEE 0*NaN = NaN
    # in the oracle but a zero-weight sentinel contributes nothing).
    assert (nan_prod != nan_orc).sum() <= 16
    both_ok = ~(nan_prod.any(-1) | nan_orc.any(-1))
    d = np.abs(flow - o_flow).max(-1)[both_ok]
    assert np.median(d) < 1e-3

    # Default policy on the same flagged bank: scrubbed to zero, all finite.
    out_zero = generate_batch(
        root, jnp.int32(0), jnp.asarray(atlas_np, jnp.float32),
        cfg=flowgen.DataGenConfig(mode=9, batch_size=1, width=W, height=H),
        warp_bank=bank_nan,
    )
    assert np.isfinite(np.asarray(out_zero["flow0"])).all()


def test_bank_and_aux_shared_big_fields():
    """make_bank_and_aux (one column-inverse solve per BIG field, crops +
    x2 slice-lerp upsamples derived from it) vs the legacy per-crop
    make_warp_aux: the bank and every linearly derived aux channel are
    identical; the gdisp channels agree to the coarse solve's own tolerance
    (different lattice phases, and the big solve sees the true field where
    the displaced row leaves a crop — the per-crop solve clamped there)."""
    cfg = flowgen.DataGenConfig(mode=9, width=W, height=H, batch_size=4)
    root = root_key(11)
    bank, (obj_aux, bg_aux) = warpgen.make_bank_and_aux(
        root, jnp.int32(0), cfg, impl="xla"
    )
    bank_ref = warpgen.make_warp_bank(root, jnp.int32(0), cfg, impl="xla")
    np.testing.assert_array_equal(np.asarray(bank.flow),
                                  np.asarray(bank_ref.flow))
    np.testing.assert_array_equal(np.asarray(bank.iflow),
                                  np.asarray(bank_ref.iflow))

    from flowgen.ops.pallas_scene import BG_EY

    n = warpgen.bank_size(cfg)
    assert obj_aux.shape == (n, 4, H, W)
    assert bg_aux.shape == (n, 2, H + 2 * BG_EY, W)

    obj_ref, bg_ref = warpgen.make_warp_aux(bank_ref, use_pallas=False)
    # Linear channels are crops / slice-lerps of the same field values:
    # bitwise identical away from the legacy path's crop-edge padding band
    # (the x2 lattice reads crop rows [0.5 - H/2, 3H/2 - 1.5]; extension
    # rows beyond that edge-replicated in the legacy path, where the
    # big-field lattice reads the true field rows instead).
    np.testing.assert_array_equal(np.asarray(obj_aux[:, 1:]),
                                  np.asarray(obj_ref[:, 1:]))
    m = max(8, BG_EY - H // 2 + 8)
    np.testing.assert_array_equal(np.asarray(bg_aux[:, 1, m:-m]),
                                  np.asarray(bg_ref[:, 1, m:-m]))
    # gdisp channels: same mathematical column inverse via different solves.
    d_obj = np.abs(np.asarray(obj_aux[:, 0]) - np.asarray(obj_ref[:, 0]))
    d_bg = np.abs(np.asarray(bg_aux[:, 0, m:-m]) -
                  np.asarray(bg_ref[:, 0, m:-m]))
    assert np.median(d_obj) < 0.05
    assert np.median(d_bg) < 0.1
