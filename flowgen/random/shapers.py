"""FlyingChairs distribution shapers.

Vectorized, stateless equivalents of ``DataGenerator::FlyingChairsRandom``
(src/caffe/DataGenerator.cpp:826-922). The power-law shaping of a unit normal
(identity / square / cube / 4th power, each with its own normalizer) reproduces
the FlyingChairs displacement histogram: small motions common, large rare.

Every function takes the *raw* standard-normal or uniform draw(s) explicitly so
callers control stream assignment; each is trivially vmappable.
"""

from __future__ import annotations

import jax.numpy as jnp


def base_gauss(a, b, x, normalize):
    """Map a (shaped) normal sample into [a, b]; out-of-range falls back to the
    midpoint (reference: baseGauss, DataGenerator.cpp:828-831)."""
    mid = (b + a) / 2.0
    sample = x * (mid - a) / normalize + mid
    ok = (a <= sample) & (sample <= b)
    return jnp.where(ok, sample, mid)


def gaussian(a, b, n01):
    """Gaussian shaper, normalizer 3 (DataGenerator.cpp:873-879)."""
    return base_gauss(a, b, n01, 3.0)


def gaussian_sq(a, b, n01):
    """Signed-square shaper, normalizer 6 (DataGenerator.cpp:882-890)."""
    t = jnp.sign(n01) * jnp.square(n01)
    return base_gauss(a, b, t, 6.0)


def gaussian_cube(a, b, n01):
    """Cube shaper, normalizer 10 (DataGenerator.cpp:893-900). The cube of a
    signed value is already signed, matching std::pow(x, 3)."""
    return base_gauss(a, b, n01 ** 3, 10.0)


def gaussian_4(a, b, n01):
    """Signed-4th-power shaper, normalizer 15 (DataGenerator.cpp:903-911)."""
    t = jnp.sign(n01) * (n01 ** 4)
    return base_gauss(a, b, t, 15.0)


def gaussian_mean_sigma_range(a, b, mean, sigma, n01):
    """Clamped-to-mean normal (DataGenerator.cpp:914-921)."""
    t = n01 * sigma + mean
    ok = (a <= t) & (t <= b)
    return jnp.where(ok, t, mean)


def trigger(p, u01):
    """Probability gate: true with probability ``p`` given u ~ U[0,1)
    (DataGenerator.cpp:846-849: ``m_RNG() < threshold``)."""
    return u01 < p


def choice(options, uint):
    """Uniform choice over a static tuple given an unbounded random int
    (DataGenerator.cpp:852-861). ``options`` is a 1-D array or tuple."""
    options = jnp.asarray(options)
    return options[uint % options.shape[0]]
