"""Affine transform tests (flowgen/ops/affine.py vs agg::trans_affine usage,
reference src/caffe/DataGenerator.cpp:302-335)."""

import jax.numpy as jnp
import numpy as np

from flowgen.ops import affine


def _pt(t, x, y):
    out = affine.apply(t, jnp.array([[x, y]], jnp.float32))
    return np.asarray(out)[0]


def test_rotation_direction():
    # AGG rotation: x' = x cos a - y sin a (counter-clockwise in math coords).
    t = affine.rotation(np.pi / 2)
    np.testing.assert_allclose(_pt(t, 1.0, 0.0), [0.0, 1.0], atol=1e-6)


def test_compose_order_matches_agg_postfix():
    # AGG: m = rotation(a); m *= translation(x, y) applies rotation FIRST.
    t = affine.compose(affine.rotation(np.pi / 2), affine.translation(10.0, 0.0))
    np.testing.assert_allclose(_pt(t, 1.0, 0.0), [10.0, 1.0], atol=1e-6)


def test_motion_transform_order():
    # setMotion: rotate, then scale, then translate (cpp:312-322).
    t = affine.motion_transform(np.pi, 2.0, 5.0, 7.0)
    np.testing.assert_allclose(_pt(t, 1.0, 0.0), [-2.0 + 5.0, 7.0], atol=1e-5)


def test_invert_roundtrip():
    t = affine.motion_transform(0.3, 1.7, -20.0, 13.0)
    r = affine.chain(t, affine.invert(t))
    np.testing.assert_allclose(np.asarray(r), np.asarray(affine.identity()), atol=1e-5)


def test_conjugate_about_fixes_center():
    # Background motion conjugation (addBackgroundMotion, cpp:324-335) leaves
    # the image center fixed under pure rotation/scale.
    m = affine.motion_transform(0.4, 1.2, 0.0, 0.0)
    conj = affine.conjugate_about(m, 256.0, 192.0)
    np.testing.assert_allclose(_pt(conj, 256.0, 192.0), [256.0, 192.0], atol=1e-3)


def test_apply_xy_matches_apply():
    t = affine.motion_transform(0.2, 0.9, 3.0, -4.0)
    xs = jnp.array([[0.0, 5.0], [2.0, 1.0]])
    ys = jnp.array([[1.0, -2.0], [0.5, 3.0]])
    nx, ny = affine.apply_xy(t, xs, ys)
    pts = jnp.stack([xs.ravel(), ys.ravel()], -1)
    ref = np.asarray(affine.apply(t, pts))
    np.testing.assert_allclose(np.asarray(nx).ravel(), ref[:, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ny).ravel(), ref[:, 1], atol=1e-5)


def test_batched_broadcasting():
    rot = jnp.array([0.0, np.pi / 2])
    t = affine.rotation(rot)
    assert t.shape == (2, 2, 3)
    inv = affine.invert(t)
    assert inv.shape == (2, 2, 3)
    r = affine.compose(t, inv)
    np.testing.assert_allclose(
        np.asarray(r), np.broadcast_to(np.asarray(affine.identity()), (2, 2, 3)),
        atol=1e-6,
    )
