"""Scene sampler tests (flowgen/params/sampler.py vs ObjectParametersGenerator
semantics, reference src/caffe/DataGenerator.cpp:1358-2835)."""

import jax
import jax.numpy as jnp
import numpy as np

from flowgen.config import MODES, MAX_COMPONENTS, MAX_OBJECTS
from flowgen.params.sampler import sample_scene, flatten_outline, SEG_DUMMY, SEG_LINE, SEG_CURVE
from flowgen.random.streams import root_key, sample_key

W, H = 512, 384


def _scene(mode, idx=0, seed=0):
    return sample_scene(
        sample_key(root_key(seed), idx), MODES[mode], width=W, height=H
    )


def test_object_count_range():
    # generateNumberOfFgObjects = int(Uniform(16,24)) -> 16..23 (cpp:2832-2835).
    counts = [int(_scene(7, i).n_objects) for i in range(30)]
    assert min(counts) >= 16 and max(counts) <= 23
    assert len(set(counts)) > 3


def test_valid_masks_consistent():
    s = _scene(7, 1)
    n = int(s.n_objects)
    valid = np.asarray(s.objects.valid)
    assert valid[:n].all() and not valid[n:].any()
    pv = np.asarray(s.prims.valid)
    # every valid object has at least primitive 0; invalid objects have none
    assert pv[:n, 0].all() or pv[:n].any(axis=1).all()
    assert not pv[n:].any()


def test_mode1_rectangles_translation_only():
    s = _scene(1, 2)
    n = int(s.n_objects)
    assert np.asarray(s.prims.is_poly)[:n, 0].all()
    # Only primitive slot 0 (no composites in mode 1).
    assert not np.asarray(s.prims.valid)[:, 1:].any()
    # Motion linear part is identity (no rotation/scale; bg is translation-only
    # too so the conjugated background adds only translation).
    lin = np.asarray(s.objects.motion)[:n, :, :2]
    np.testing.assert_allclose(lin, np.broadcast_to(np.eye(2), lin.shape), atol=1e-5)
    # Rectangle: first 4 edge points span an axis-aligned box in local coords;
    # edge points come in 6-fold subdivided runs so corners repeat at stride 6.
    pts = np.asarray(s.prims.edge_pts)[0, 0]
    xs, ys = pts[:, 0], pts[:, 1]
    assert np.allclose(np.abs(xs[0]), xs.max(), atol=1e-4)
    assert set(np.round(np.abs(np.unique(np.round(xs, 3)))).tolist()) is not None
    # intrinsic rotation is zero in mode 1
    intr = np.asarray(s.prims.intrinsic)[:n, 0]
    np.testing.assert_allclose(intr[:, 0, 1], 0.0, atol=1e-6)


def test_mode3_all_ellipses():
    s = _scene(3, 3)
    n = int(s.n_objects)
    assert not np.asarray(s.prims.is_poly)[:n, 0].any()
    rx = np.asarray(s.prims.ell_rx)[:n, 0]
    # U(0.5, 2) * 50 -> [25, 100] (cpp:2254-2255)
    assert rx.min() >= 25.0 and rx.max() <= 100.0


def test_mode7_composites_and_thin():
    # Across enough samples mode 7 must produce: composites with multiple
    # components, subtractive components, and thin objects (rx < 25*0.05*...).
    any_multi = any_sub = any_thin = False
    for i in range(25):
        s = _scene(7, i)
        pv = np.asarray(s.prims.valid)
        if (pv.sum(1) > 1).any():
            any_multi = True
        if (np.asarray(~s.prims.additive) & pv).any():
            any_sub = True
        rx = np.asarray(s.prims.ell_rx)
        is_ell = pv & ~np.asarray(s.prims.is_poly)
        if (is_ell & (rx < 10.0)).any():
            any_thin = True
    assert any_multi and any_sub and any_thin


def test_component_slot0_is_additive():
    # Composite primary component is always additive (cpp:2400-2401).
    for i in range(10):
        s = _scene(6, i)
        pv = np.asarray(s.prims.valid)
        add = np.asarray(s.prims.additive)
        assert add[pv[:, 0], 0].all()


def test_background_motion_distribution():
    # Mode 1: bg rot/scale disabled -> linear part identity; translations
    # bounded by Gaussian4(-40, 40).
    trans = []
    for i in range(40):
        s = _scene(1, i)
        m = np.asarray(s.background.motion)
        np.testing.assert_allclose(m[:, :2], np.eye(2), atol=1e-6)
        trans.append(m[:, 2])
    trans = np.array(trans)
    assert np.abs(trans).max() <= 40.0
    # Gaussian4 concentrates near 0
    assert np.median(np.abs(trans)) < 10.0


def test_determinism_and_stream_separation():
    a = _scene(7, 5)
    b = _scene(7, 5)
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    c = _scene(7, 6)
    diff = any(
        not np.array_equal(np.asarray(la), np.asarray(lc))
        for la, lc in zip(jax.tree.leaves(a), jax.tree.leaves(c))
    )
    assert diff


def test_flatten_outline_lines():
    # A pure-line triangle compacts to exactly its 3 vertices (straight-edge
    # subdivision points are geometrically inert and dropped).
    verts = jnp.zeros((20, 2)).at[:3].set(
        jnp.array([[0.0, 0.0], [60.0, 0.0], [0.0, 60.0]])
    )
    types = jnp.full((20,), SEG_LINE, jnp.int32).at[0].set(SEG_DUMMY)
    pts, n = flatten_outline(verts, types, jnp.int32(3))
    pts = np.asarray(pts)
    assert int(n) == 3
    np.testing.assert_allclose(pts[0], [0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(pts[1], [60.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(pts[2], [0.0, 60.0], atol=1e-5)
    # Padding repeats point 0.
    np.testing.assert_allclose(pts[3:], 0.0, atol=1e-5)


def test_flatten_outline_curve_midpoint():
    # Curve at index 1 (ctrl v1, endpoint v2): Bezier(v0, v1, v2) sampled over
    # two edge slots of 6 points each; the second half starts at B(0.5).
    verts = jnp.zeros((20, 2)).at[:4].set(
        jnp.array([[0.0, 0.0], [30.0, 60.0], [60.0, 0.0], [0.0, -40.0]])
    )
    types = (
        jnp.full((20,), SEG_LINE, jnp.int32)
        .at[0].set(SEG_DUMMY).at[1].set(SEG_CURVE).at[2].set(SEG_DUMMY)
    )
    pts, n = flatten_outline(verts, types, jnp.int32(4))
    pts = np.asarray(pts)
    # Layout: 6 first-half + 6 second-half Bezier samples + [v2] + [v3].
    assert int(n) == 14
    b_half = (
        0.25 * np.array([0.0, 0.0])
        + 0.5 * np.array([30.0, 60.0])
        + 0.25 * np.array([60.0, 0.0])
    )
    np.testing.assert_allclose(pts[0], [0.0, 0.0], atol=1e-5)   # B(0) = v0
    np.testing.assert_allclose(pts[6], b_half, atol=1e-4)       # B(0.5)
    np.testing.assert_allclose(pts[12], [60.0, 0.0], atol=1e-4)  # v2 = B(1)
    np.testing.assert_allclose(pts[13], [0.0, -40.0], atol=1e-4)
