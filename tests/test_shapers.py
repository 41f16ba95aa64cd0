"""Distribution shaper tests (flowgen/random/shapers.py vs the semantics of
FlyingChairsRandom, reference src/caffe/DataGenerator.cpp:826-922)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowgen.random import shapers
from flowgen.random.streams import (
    Stream,
    normal,
    root_key,
    sample_key,
    stream_key,
    uniform,
    uniform_int,
)


def _normals(n, seed=0):
    return jax.random.normal(jax.random.key(seed), (n,))


def test_base_gauss_midpoint_fallback():
    # Out-of-range samples fall back to the midpoint (cpp:828-831).
    out = shapers.base_gauss(-1.0, 1.0, jnp.array([100.0, -100.0]), 3.0)
    np.testing.assert_allclose(out, [0.0, 0.0])


def test_base_gauss_linear_map():
    # sample = x * ((b+a)/2 - a)/norm + (b+a)/2
    out = shapers.base_gauss(0.0, 10.0, jnp.array([1.0]), 5.0)
    np.testing.assert_allclose(out, [6.0])


def test_gaussian_shapers_stay_in_range():
    x = _normals(20000)
    for fn in (shapers.gaussian, shapers.gaussian_sq, shapers.gaussian_cube,
               shapers.gaussian_4):
        out = np.asarray(fn(-40.0, 40.0, x))
        assert out.min() >= -40.0 and out.max() <= 40.0
        # symmetric around 0
        assert abs(out.mean()) < 1.0


def test_power_shaping_concentrates_mass():
    # Higher powers concentrate more mass near zero (the FlyingChairs
    # displacement histogram property).
    x = _normals(50000)
    fracs = []
    for fn in (shapers.gaussian, shapers.gaussian_sq, shapers.gaussian_cube,
               shapers.gaussian_4):
        out = np.abs(np.asarray(fn(-40.0, 40.0, x)))
        fracs.append((out < 4.0).mean())
    assert fracs[0] < fracs[1] < fracs[3]
    assert fracs[0] < fracs[2]


def test_gaussian_degenerate_range_is_constant():
    # GaussianSq(1, 1) must always return 1 (used for "no scaling" modes).
    out = shapers.gaussian_sq(1.0, 1.0, _normals(100))
    np.testing.assert_allclose(out, np.ones(100))


def test_gaussian_mean_sigma_range():
    x = _normals(10000)
    out = np.asarray(shapers.gaussian_mean_sigma_range(0.2, 2.5, 0.8, 0.8, x))
    assert out.min() >= 0.2 and out.max() <= 2.5
    # fallback puts extra mass exactly at the mean
    assert (out == 0.8).mean() > 0.01


def test_trigger_probability():
    u = jax.random.uniform(jax.random.key(1), (100000,))
    assert np.asarray(shapers.trigger(0.3, u)).mean() == pytest.approx(0.3, abs=0.01)
    assert not np.asarray(shapers.trigger(0.0, u)).any()
    assert np.asarray(shapers.trigger(1.0, u)).all()


def test_choice_uniformity():
    ints = jax.random.randint(jax.random.key(2), (30000,), 0, 1 << 30)
    out = np.asarray(shapers.choice(jnp.array([5, 7, 9]), ints))
    for v in (5, 7, 9):
        assert (out == v).mean() == pytest.approx(1 / 3, abs=0.02)


def test_streams_deterministic_and_independent():
    root = root_key(42)
    k1 = stream_key(sample_key(root, 7), Stream.OBJ_ROT, 3)
    k2 = stream_key(sample_key(root, 7), Stream.OBJ_ROT, 3)
    k3 = stream_key(sample_key(root, 7), Stream.OBJ_SCALE, 3)
    k4 = stream_key(sample_key(root, 8), Stream.OBJ_ROT, 3)
    a, b = uniform(k1, 0, 1), uniform(k2, 0, 1)
    assert float(a) == float(b)
    assert float(a) != float(uniform(k3, 0, 1))
    assert float(a) != float(uniform(k4, 0, 1))


def test_uniform_int_closed_range():
    vals = np.asarray(uniform_int(root_key(0), 3, 20, (20000,)))
    assert vals.min() == 3 and vals.max() == 20


def test_normal_moments():
    vals = np.asarray(normal(root_key(3), 2.0, 0.5, (50000,)))
    assert vals.mean() == pytest.approx(2.0, abs=0.02)
    assert vals.std() == pytest.approx(0.5, abs=0.02)
