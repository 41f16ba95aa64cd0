"""Backend-invariant elementary transcendentals (deterministic across XLA
CPU / XLA TPU / Mosaic).

Why this exists: mode-9 content is defined by the warp-field bank, and the
bank's 17 self-composition doublings (WarpFields.cpp:366-384) are chaotic —
a 1-ulp difference in the elementary field amplifies to multi-pixel
divergence in the composed field. `jnp.exp/sin/cos` and f32 division lower
differently per backend (libm on CPU, polynomial/reciprocal approximations
on TPU), so any content derived through them is only reproducible *per
backend*. The functions here are built exclusively from operations that are
exactly rounded (IEEE-754 RNE) or exact on every backend — f32 add/sub/mul,
floor, min/max, select, integer ops, and i32<->f32 bitcasts — so their
results are bit-identical wherever they run, which restores the framework's
"every batch is a pure function of (seed, step)" contract for mode 9
(README.md; the reference has one scalar implementation and needs no such
machinery).

The one backend freedom that survives exact rounding is FMA contraction:
compilers may fuse ``a*b + c`` into a single-rounding fma (measured: XLA:TPU
fuses, XLA:CPU doesn't — ~25% of lanes differ by 1 ulp per mul+add, and the
contraction happens in backend codegen, BELOW ``lax.optimization_barrier``
and bitcast round-trips, both of which measurably fail to stop it).
:func:`fma_barrier` pins a product's own rounding with a select whose
predicate is ``src == src`` on a traced operand: the compiler cannot fold
the predicate (it is false for NaN) and measurably does not contract
through the select, on XLA:TPU, XLA:CPU, and Mosaic alike (see
tests/test_detmath.py; tools/check_pallas_tpu.py ``bank`` certifies the
end-to-end result on real hardware). Every product-feeding-add in this
module is pinned. Products that are EXACT (by construction, e.g. Cody-Waite
hi-parts, multiplies by powers of two) need no pin — a fused single
rounding of an exact product equals the two-step rounding.

Accuracy: ~1-2 ulp vs libm (Cephes-grade minimax polynomials; the reciprocal
is 3 Newton steps from a bit-trick seed). That is far below the content's
own stochastic scale; determinism, not correct rounding, is the contract.

These belong on CONTENT-GENERATING paths whose outputs feed chaotic
amplification or long-lived caches (warpfields/fields.py and the bank
kernels in warpfields/pallas_fields.py). Rigid geometry (affine params,
shapers) tolerates per-backend ulp noise and keeps the faster builtins.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# exp: Cody-Waite ln2 split (k*LN2_HI is exact for |k| < 2^13: LN2_HI has
# 10 significant bits) + degree-6 minimax polynomial on [-ln2/2, ln2/2].
_LOG2E = 1.44269504088896341
_LN2_HI = 0.693359375
_LN2_LO = -2.12194440e-4
_EXP_C = (
    1.9875691500e-4,
    1.3981999507e-3,
    8.3334519073e-3,
    4.1665795894e-2,
    1.6666665459e-1,
    5.0000001201e-1,
)

# sin/cos: pi/2 three-way split (j*DP1 and j*DP2 are exact for the |j| <= 3
# this module's [-4, 4] domain produces: 10/11 significant bits) + odd/even
# minimax polynomials on [-pi/4, pi/4].
_DP1 = 1.5703125
_DP2 = 4.837512969970703125e-4
_DP3 = 7.549789948768648e-8
_SIN_C = (-1.9515295891e-4, 8.3321608736e-3, -1.6666654611e-1)
_COS_C = (2.443315711809948e-5, -1.388731625493765e-3, 4.166664568298827e-2)


def _f32(x):
    return jnp.asarray(x, jnp.float32)


def fma_barrier(prod, src):
    """Pin a product's own rounding: a compiler may contract ``a*b + c``
    into one fma (single rounding) — legal per IEEE, but backend-dependent.
    ``fma_barrier(a*b, a) + c`` forces the separately-rounded product on
    every backend. ``src`` must be a TRACED float operand of the product
    (so ``src == src`` cannot be constant-folded; it is false for NaN, and
    if src IS NaN the product is NaN too, so the select is value-neutral).
    Pin products only, never sums — wrapping an add in the select re-opens
    a sinking rewrite that restores the contraction (measured)."""
    return jnp.where(src == src, prod, src)


def det_lerp(p0, p1, t):
    """p0 + (p1-p0)*t with the product's rounding pinned — the bilinear
    blend of the bank kernels' banded taps (bit-identical per backend)."""
    return p0 + fma_barrier((p1 - p0) * t, t)


def det_recip(y):
    """1/y for normal, nonzero y — bit-trick seed + 3 Newton iterations
    (each exactly rounded, so the fixed point is backend-invariant)."""
    y = _f32(y)
    a = jnp.abs(y)
    seed = lax.bitcast_convert_type(
        jnp.int32(0x7EF311C3) - lax.bitcast_convert_type(a, jnp.int32),
        jnp.float32,
    )
    r = seed
    for _ in range(3):
        r = r * (_f32(2.0) - fma_barrier(a * r, a))
    return jnp.where(y < 0, -r, r)


def det_div(x, y):
    """x/y via the deterministic reciprocal (~2 ulp; backend-invariant)."""
    return _f32(x) * det_recip(y)


def det_exp(x):
    """exp(x) for x <= 0 (support weights), clamped at exp(-87.0) ~ 1.6e-38
    (the smallest normal scale; true weights below that are physically zero
    and a denormal-vs-FTZ backend difference would break bit-identity)."""
    x = jnp.maximum(_f32(x), _f32(-87.0))
    k = jnp.floor(fma_barrier(x * _f32(_LOG2E), x) + _f32(0.5))
    # k*LN2_HI is exact -> its subtraction is contraction-neutral; the LO
    # product is not, so pin it.
    r = (x - k * _f32(_LN2_HI)) - fma_barrier(k * _f32(_LN2_LO), k)
    p = _f32(_EXP_C[0])
    for c in _EXP_C[1:]:
        p = fma_barrier(p * r, r) + _f32(c)
    e = fma_barrier(p * (r * r), r) + r + _f32(1.0)
    scale = lax.bitcast_convert_type(
        (k.astype(jnp.int32) + 127) << 23, jnp.float32
    )
    return e * scale


def _reduce_quadrant(x):
    """x = j*(pi/2) + r with |r| <= pi/4 + eps, j in [-3, 3] for |x| <= 4.
    Returns (j mod 4 as int32 in [0, 3], r)."""
    x = _f32(x)
    j = jnp.floor(fma_barrier(x * _f32(2.0 / jnp.pi), x) + _f32(0.5))
    r = ((x - j * _f32(_DP1)) - j * _f32(_DP2)) - fma_barrier(
        j * _f32(_DP3), j
    )
    m = (j.astype(jnp.int32) & 3).astype(jnp.int32)
    return m, r


def _sin_poly(r):
    r2 = r * r
    p = _f32(_SIN_C[0])
    for c in _SIN_C[1:]:
        p = fma_barrier(p * r2, r2) + _f32(c)
    return fma_barrier((p * r2) * r, r) + r


def _cos_poly(r):
    r2 = r * r
    p = _f32(_COS_C[0])
    for c in _COS_C[1:]:
        p = fma_barrier(p * r2, r2) + _f32(c)
    # 0.5*r2 is an exact product -> contraction-neutral subtraction.
    return (fma_barrier(p * (r2 * r2), r2) - _f32(0.5) * r2) + _f32(1.0)


def det_sin(x):
    """sin(x) for |x| <= 4 (angles are in [-pi, pi] on every caller)."""
    m, r = _reduce_quadrant(x)
    s, c = _sin_poly(r), _cos_poly(r)
    v = jnp.where(m % 2 == 0, s, c)
    return jnp.where(m >= 2, -v, v)


def det_cos(x):
    """cos(x) for |x| <= 4."""
    m, r = _reduce_quadrant(x)
    s, c = _sin_poly(r), _cos_poly(r)
    v = jnp.where(m % 2 == 0, c, -s)
    return jnp.where(m >= 2, -v, v)
