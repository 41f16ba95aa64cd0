"""2x3 affine transform helpers.

TPU-native replacement for the ``agg::trans_affine`` plumbing used throughout
the reference's object model (MovingObjectBase::setIntrinsicTransform /
setMotion / addBackgroundMotion, src/caffe/DataGenerator.cpp:302-335).

A transform is a ``(..., 2, 3)`` array ``[L | t]`` acting on column points:
``p -> L @ p + t``. ``compose(a, b)`` applies ``a`` first, then ``b`` — matching
AGG's ``a *= b`` postfix convention, so reference expressions transcribe
one-to-one. All ops broadcast over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def identity(dtype=jnp.float32):
    return jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], dtype=dtype)


def rotation(alpha):
    """agg::trans_affine_rotation."""
    alpha = jnp.asarray(alpha, jnp.float32)
    c, s = jnp.cos(alpha), jnp.sin(alpha)
    z = jnp.zeros_like(c)
    return jnp.stack(
        [jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1)], -2
    )


def scaling(s):
    """agg::trans_affine_scaling (isotropic)."""
    s = jnp.asarray(s, jnp.float32)
    z = jnp.zeros_like(s)
    return jnp.stack(
        [jnp.stack([s, z, z], -1), jnp.stack([z, s, z], -1)], -2
    )


def translation(tx, ty):
    """agg::trans_affine_translation."""
    tx = jnp.asarray(tx, jnp.float32)
    ty = jnp.broadcast_to(jnp.asarray(ty, jnp.float32), tx.shape)
    o = jnp.ones_like(tx)
    z = jnp.zeros_like(tx)
    return jnp.stack(
        [jnp.stack([o, z, tx], -1), jnp.stack([z, o, ty], -1)], -2
    )


def _mat_apply(l, vx, vy):
    """2x2 linear part applied to a vector; explicit FMAs rather than einsum so
    the math stays full-precision f32 on TPU (default matmul precision is bf16)
    and off the MXU (2x2 contractions are pure VPU work)."""
    return (
        l[..., 0, 0] * vx + l[..., 0, 1] * vy,
        l[..., 1, 0] * vx + l[..., 1, 1] * vy,
    )


def compose(a, b):
    """Apply ``a`` first, then ``b`` (AGG ``a *= b``): returns ``[L_b L_a | L_b t_a + t_b]``."""
    a, b = jnp.broadcast_arrays(a, b)
    la, ta = a[..., :2], a[..., 2]
    lb, tb = b[..., :2], b[..., 2]
    c00, c10 = _mat_apply(lb, la[..., 0, 0], la[..., 1, 0])
    c01, c11 = _mat_apply(lb, la[..., 0, 1], la[..., 1, 1])
    tx, ty = _mat_apply(lb, ta[..., 0], ta[..., 1])
    row0 = jnp.stack([c00, c01, tx + tb[..., 0]], -1)
    row1 = jnp.stack([c10, c11, ty + tb[..., 1]], -1)
    return jnp.stack([row0, row1], -2)


def chain(*ts):
    """compose(t0, t1, t2, ...) applied left-to-right."""
    out = ts[0]
    for t in ts[1:]:
        out = compose(out, t)
    return out


def invert(a):
    """agg::trans_affine::invert."""
    l, t = a[..., :2], a[..., 2]
    det = l[..., 0, 0] * l[..., 1, 1] - l[..., 0, 1] * l[..., 1, 0]
    inv_det = 1.0 / det
    li = jnp.stack(
        [
            jnp.stack([l[..., 1, 1], -l[..., 0, 1]], -1),
            jnp.stack([-l[..., 1, 0], l[..., 0, 0]], -1),
        ],
        -2,
    ) * inv_det[..., None, None]
    tix, tiy = _mat_apply(li, t[..., 0], t[..., 1])
    ti = -jnp.stack([tix, tiy], -1)
    return jnp.concatenate([li, ti[..., None]], axis=-1)


def apply(a, pts):
    """Transform points. ``pts``: (..., N, 2); broadcasts over batch."""
    l, t = a[..., :2], a[..., 2]
    px, py = _mat_apply(l[..., None, :, :], pts[..., 0], pts[..., 1])
    return jnp.stack([px, py], -1) + t[..., None, :]


def apply_xy(a, x, y):
    """Transform coordinate grids elementwise; a: (2,3), x/y: any shape."""
    nx = a[0, 0] * x + a[0, 1] * y + a[0, 2]
    ny = a[1, 0] * x + a[1, 1] * y + a[1, 2]
    return nx, ny


def apply_xy_det(a, x, y):
    """``apply_xy`` with both products' rounding pinned
    (detmath.fma_barrier): XLA and Mosaic contract ``a*b + c`` into fma in
    backend codegen, so the SAME expression can round differently per
    context; pinned, the background-flow grids of the windowed XLA path and
    the scene megakernel agree to the last bit. ``a`` may be a (2,3) array
    or a flat 6-tuple of scalars (the kernel's SMEM reads)."""
    from .detmath import fma_barrier

    if isinstance(a, (tuple, list)):
        a00, a01, a02, a10, a11, a12 = a
    else:
        a00, a01, a02 = a[0, 0], a[0, 1], a[0, 2]
        a10, a11, a12 = a[1, 0], a[1, 1], a[1, 2]
    nx = fma_barrier(a00 * x, x) + fma_barrier(a01 * y, y) + a02
    ny = fma_barrier(a10 * x, x) + fma_barrier(a11 * y, y) + a12
    return nx, ny


def motion_transform(rot, scale, tx, ty):
    """Object motion R·S·T (MovingObjectBase::setMotion, DataGenerator.cpp:312-322):
    rotate, then scale, then translate."""
    return chain(rotation(rot), scaling(scale), translation(tx, ty))


def intrinsic_transform(rot, tx, ty):
    """Intrinsic pose R·T (setIntrinsicTransform, DataGenerator.cpp:302-310)."""
    return chain(rotation(rot), translation(tx, ty))


def conjugate_about(m, cx, cy):
    """T(-c) · m · T(c): apply ``m`` about center ``c``  — the background-motion
    conjugation of addBackgroundMotion (DataGenerator.cpp:324-335)."""
    return chain(translation(-cx, -cy), m, translation(cx, cy))
