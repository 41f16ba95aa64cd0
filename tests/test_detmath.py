"""ops/detmath: backend-invariant transcendentals for the mode-9 content
contract.

CPU can only test ACCURACY (vs numpy float64) and the algebraic properties;
the cross-backend bit-identity these functions exist for is certified on
real hardware by ``tools/check_pallas_tpu.py bank`` (Mosaic TPU vs CPU
interpret, end to end through the bank composition — see
PALLAS_CHECK_r04.json). Reference semantics being protected:
WarpFields.cpp:31-115 (supports), 337-437 (the chaotic composition that
amplifies any per-backend ulp into pixels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowgen.ops.detmath import (
    det_cos, det_div, det_exp, det_lerp, det_recip, det_sin,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_det_exp_accuracy(rng):
    # Domain: support weights, exp(x) for x <= 0; below the -87 clamp the
    # true value is denormal-or-zero and detmath returns exp(-87).
    x = np.float32(-rng.uniform(0, 87, 50000))
    got = np.asarray(jax.jit(det_exp)(jnp.asarray(x)))
    ref = np.exp(x.astype(np.float64))
    rel = np.abs(got - ref) / np.maximum(ref, 1e-300)
    assert rel.max() < 3e-7
    # Exact endpoints.
    assert float(det_exp(jnp.float32(0.0))) == 1.0
    assert float(det_exp(jnp.float32(-200.0))) > 0.0  # clamped, not flushed


def test_det_trig_accuracy(rng):
    x = np.float32(rng.uniform(-4, 4, 50000))
    s = np.asarray(jax.jit(det_sin)(jnp.asarray(x)))
    c = np.asarray(jax.jit(det_cos)(jnp.asarray(x)))
    assert np.abs(s - np.sin(x.astype(np.float64))).max() < 3e-7
    assert np.abs(c - np.cos(x.astype(np.float64))).max() < 3e-7


def test_det_recip_div_accuracy(rng):
    y = np.float32(rng.uniform(1e-3, 1e4, 50000)) * np.where(
        rng.uniform(size=50000) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    r = np.asarray(jax.jit(det_recip)(jnp.asarray(y)))
    rel = np.abs(r * y.astype(np.float64) - 1.0)
    assert rel.max() < 3e-7
    d = np.asarray(jax.jit(det_div)(jnp.float32(3.0), jnp.asarray(y)))
    assert np.abs(d * y.astype(np.float64) - 3.0).max() < 1e-6


def test_det_lerp_endpoints():
    p0 = jnp.float32(2.0)
    p1 = jnp.float32(6.0)
    assert float(det_lerp(p0, p1, jnp.float32(0.0))) == 2.0
    assert float(det_lerp(p0, p1, jnp.float32(1.0))) == 6.0
    assert float(det_lerp(p0, p1, jnp.float32(0.25))) == 3.0


def test_nan_propagation():
    # The fma_barrier select keys on src==src; a NaN src must still yield
    # NaN results, not silently select a stale value.
    nan = jnp.float32(np.nan)
    assert np.isnan(float(det_sin(nan)))
    assert np.isnan(float(det_exp(nan * -1.0)))
    assert np.isnan(float(det_lerp(jnp.float32(1.0), jnp.float32(2.0), nan)))
