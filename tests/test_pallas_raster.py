"""Pallas polygon-coverage kernel vs the pure-XLA reference path
(flowgen/ops/pallas_raster.py vs ops/raster.py), run in interpreter mode on
the CPU test mesh. On-device numerical equivalence is exercised by
tools/check_pallas_tpu.py on real hardware."""

import jax.numpy as jnp
import numpy as np

from flowgen.ops import raster
from flowgen.ops.pallas_raster import polygon_coverage_pallas


def _compare(pts, n_edges, w=128, h=32):
    px, py = raster.pixel_grid(w, h)
    ref_aa, ref_in = raster.polygon_coverage(pts, px, py)
    aa, inside = polygon_coverage_pallas(
        pts, jnp.int32(n_edges), px, py, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(inside), np.asarray(ref_in))
    # Identical math up to FMA association order.
    np.testing.assert_allclose(np.asarray(aa), np.asarray(ref_aa), atol=1e-5)


def test_square_matches_reference():
    sq = jnp.array(
        [[20.0, 5.0], [60.0, 5.0], [60.0, 25.0], [20.0, 25.0]], jnp.float32
    )
    padded = jnp.concatenate([sq, jnp.tile(sq[:1], (12, 1))])
    _compare(padded, 4)


def test_star_with_padding_culled():
    rng = np.random.default_rng(1)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 9))
    r = rng.uniform(5, 14, 9)
    pts = np.stack([64 + r * np.cos(ang), 16 + r * np.sin(ang)], -1).astype(
        np.float32
    )
    padded = np.concatenate([pts, np.tile(pts[:1], (23, 1))])
    # Padding slots repeat point 0 and must not affect the result; the kernel
    # additionally skips them via n_edges.
    _compare(jnp.asarray(padded), 9)


def test_object_window_kernel_matches_composition():
    # The fused per-object kernel (coverage + mask algebra + blend + flow)
    # must reproduce the op-by-op composition used by the XLA path.
    from flowgen.ops.pallas_raster import object_window_pallas

    wh, ww = 32, 128
    C, E = 3, 16
    rng = np.random.default_rng(0)

    # prim 0: additive polygon (a box); prim 1: subtractive ellipse
    box = np.array([[20.0, 5.0], [90.0, 5.0], [90.0, 28.0], [20.0, 28.0]])
    pts = np.tile(box[:1][None], (C, E, 1)).astype(np.float32)
    pts[0, :4] = box
    n_edges = np.array([4, 0, 0], np.int32)
    additive = np.array([1, 0, 0], np.int32)
    is_poly = np.array([1, 0, 0], np.int32)
    n_prims = 2

    # ellipse prim 1: centered at (55, 16), radii (20, 8); inverse transform
    # of a pure translation
    inv = np.zeros((C, 6), np.float32)
    inv[:, 0] = 1.0
    inv[:, 4] = 1.0
    inv[1, 2] = -55.0
    inv[1, 5] = -16.0
    rx = np.array([1.0, 20.0, 1.0], np.float32)
    ry = np.array([1.0, 8.0, 1.0], np.float32)

    motion = np.array([1.0, 0.0, 7.0, 0.0, 1.0, -3.0], np.float32)  # translate
    b = np.roll(pts, -1, axis=1)
    edges = np.stack(
        [pts[..., 0], pts[..., 1], b[..., 0], b[..., 1]], 0
    ).reshape(4, C * E)
    meta = np.concatenate([[n_prims, 0, 0], additive, is_poly, n_edges]).astype(
        np.int32
    )
    fmeta = np.concatenate(
        [motion, np.concatenate([inv, rx[:, None], ry[:, None]], 1).reshape(-1)]
    ).astype(np.float32)

    tex = rng.uniform(0, 255, (wh, ww, 3)).astype(np.float32)
    frame = rng.uniform(0, 255, (wh, ww, 3)).astype(np.float32)
    flow = rng.normal(0, 2, (wh, ww, 2)).astype(np.float32)

    f_out, fl_out = object_window_pallas(
        jnp.asarray(edges), jnp.asarray(meta), jnp.asarray(fmeta),
        jnp.asarray(tex), jnp.asarray(frame), jnp.asarray(flow),
        use_aa=True, emit_flow=True, interpret=True,
    )

    # Reference composition with the XLA ops.
    px, py = raster.pixel_grid(ww, wh)
    aa0, in0 = raster.polygon_coverage(jnp.asarray(pts[0]), px, py)
    tr = jnp.array([[1.0, 0, 55.0], [0, 1, 16.0]])
    aa1, in1 = raster.ellipse_coverage(tr, 20.0, 8.0, px, py)
    acc_aa, acc_in = raster.combine_additive(
        jnp.zeros((wh, ww)), jnp.zeros((wh, ww), bool), aa0, in0
    )
    acc_aa, acc_in = raster.combine_subtractive(acc_aa, acc_in, aa1, in1)
    ref_frame = np.round(
        frame * (1 - np.asarray(acc_aa)[..., None])
        + tex * np.asarray(acc_aa)[..., None]
    )
    ix, iy = raster.pixel_grid(ww, wh, 0.0)
    of = np.stack([np.full((wh, ww), 7.0), np.full((wh, ww), -3.0)], -1)
    ref_flow = np.where(np.asarray(acc_in)[..., None], of, flow)

    np.testing.assert_array_equal(np.asarray(fl_out), ref_flow)
    np.testing.assert_allclose(np.asarray(f_out), ref_frame, atol=1.0)
    # bulk of pixels exact
    assert (np.abs(np.asarray(f_out) - ref_frame) > 0).mean() < 0.01


def test_full_slots():
    rng = np.random.default_rng(2)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 16))
    r = rng.uniform(6, 14, 16)
    pts = np.stack([64 + r * np.cos(ang), 16 + r * np.sin(ang)], -1).astype(
        np.float32
    )
    _compare(jnp.asarray(pts), 16)
