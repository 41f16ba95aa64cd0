"""Analytic coverage rasterization: the AGG replacement.

The reference rasterizes every shape with AGG's scanline engine
(``rasterizer_scanline_aa`` + ``scanline_u8``, MovingObjectBase::draw,
src/caffe/DataGenerator.cpp:351-368): anti-aliased coverage with
``gamma_none``, and a binary mask via ``gamma_threshold(0.5)``. Scanlines are
inherently sequential; on TPU we instead evaluate coverage *per pixel over the
whole frame* in one fused dispatch:

* **binary (non-AA) coverage** — exact nonzero-winding inside test at pixel
  centers. AGG's thresholded mask keeps pixels with >=50% area coverage; the
  pixel-center rule agrees except on a measure-zero set of boundary pixels.
  This mask drives the index image and therefore the ground-truth flow
  (RenderCore::blitObject, cpp:762-774), so it must be crisp — and it is exact.
* **anti-aliased coverage** — signed-distance approximation:
  ``clamp(0.5 - sdf, 0, 1)``, with the distance taken to the nearest outline
  segment. This matches AGG's exact-area coverage to within a few percent on
  straight edges (a linear ramp vs exact trapezoid area) and only feeds *image*
  compositing, never flow.

Polygons arrive pre-flattened to ``MAX_EDGES`` points (see
params/sampler.flatten_outline). Ellipses are handled analytically in closed
form — strictly more accurate than the reference, which approximates them as
100-gons (agg::ellipse with 100 steps, cpp:1080).

All functions return ``(aa, inside)`` where ``aa`` is float coverage in [0,1]
and ``inside`` the exact binary mask, both shaped like the pixel grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import affine

# Edge-coefficient contractions carry pixel coordinates (magnitude ~1e3) and
# need sub-pixel accuracy; TPU default matmul precision (one bf16 pass) would
# introduce multi-pixel error, so force full f32 accumulation.
_PRECISION = jax.lax.Precision.HIGHEST


def _matmul(a, b):
    return jnp.matmul(a, b, precision=_PRECISION)


def pixel_grid(width, height, center_offset=0.5, dtype=jnp.float32):
    """Pixel sample positions. AGG/CImg address pixel (x, y) as the unit square
    [x, x+1) x [y, y+1); coverage is evaluated at centers (+0.5) while flow is
    evaluated at integer coordinates (RenderCore::computeFlowImage uses the raw
    loop indices, cpp:807-817)."""
    ys = jnp.arange(height, dtype=dtype) + center_offset
    xs = jnp.arange(width, dtype=dtype) + center_offset
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    return px, py


def polygon_coverage(edge_pts, px, py):
    """Coverage of a closed polyline against a pixel grid.

    ``edge_pts``: (E, 2) closed outline (edge e runs points e -> e+1 mod E;
    repeated points are inert). ``px``/``py``: (H, W) sample positions.

    Returns (aa, inside):
      inside — nonzero-winding test (AGG default fill rule) at the samples.
      aa     — clamp(0.5 - signed_distance_to_outline, 0, 1).

    Implementation: for each edge, the signed perpendicular line distance and
    the segment parameter are *linear* in (px, py), so both are evaluated as a
    single [HW, 3] x [3, 2E] contraction, followed by cheap elementwise winding
    and min-distance reductions over the edge axis. XLA fuses the lot.
    """
    a = edge_pts
    b = jnp.roll(edge_pts, -1, axis=0)
    d = b - a
    len2 = jnp.sum(d * d, axis=-1)
    degenerate = len2 < 1e-12
    inv_len = jnp.where(degenerate, 0.0, 1.0 / jnp.sqrt(jnp.maximum(len2, 1e-12)))
    inv_len2 = inv_len * inv_len

    # cross(p) = d.x*(py - a.y) - d.y*(px - a.x): rows [c_px, c_py, c_1].
    perp_coef = jnp.stack(
        [-d[:, 1], d[:, 0], d[:, 1] * a[:, 0] - d[:, 0] * a[:, 1]], axis=0
    ) * inv_len[None, :]
    # t(p)*len2 = (p - a) . d: rows [d.x, d.y, -a.d].
    t_coef = jnp.stack(
        [d[:, 0], d[:, 1], -(a[:, 0] * d[:, 0] + a[:, 1] * d[:, 1])], axis=0
    ) * inv_len2[None, :]

    shape = px.shape
    p_aug = jnp.stack([px.ravel(), py.ravel(), jnp.ones_like(px).ravel()], axis=-1)
    coefs = jnp.concatenate([perp_coef, t_coef], axis=1)  # (3, 2E)
    res = _matmul(p_aug, coefs)                           # (HW, 2E)
    E = a.shape[0]
    perp = res[:, :E]
    t = res[:, E:]

    # Nonzero-winding accumulation via the standard crossing rule: an upward
    # edge (a.y <= y < b.y) with the point strictly left (perp > 0) adds +1,
    # a downward edge with the point right adds -1.
    pyf = p_aug[:, 1:2]
    ay = a[None, :, 1]
    by = b[None, :, 1]
    up = (ay <= pyf) & (by > pyf) & (perp > 0)
    down = (by <= pyf) & (ay > pyf) & (perp < 0)
    winding = jnp.sum(up.astype(jnp.int32) - down.astype(jnp.int32), axis=-1)
    inside = winding != 0

    # Distance to the outline: min over segment-interior perpendiculars and
    # vertex distances. (When t falls outside [0,1] the true segment distance
    # is an endpoint distance, which the vertex minimum covers.)
    seg_ok = (t >= 0.0) & (t <= 1.0) & ~degenerate[None, :]
    perp_d = jnp.where(seg_ok, jnp.abs(perp), jnp.inf)
    # Vertex distance via |p - a|^2 expansion (shares the matmul inputs).
    va = (
        jnp.sum(p_aug[:, :2] ** 2, axis=-1, keepdims=True)
        - 2.0 * _matmul(p_aug[:, :2], a.T)
        + jnp.sum(a * a, axis=-1)[None, :]
    )
    vert_d = jnp.sqrt(jnp.maximum(jnp.min(va, axis=-1), 0.0))
    dist = jnp.minimum(jnp.min(perp_d, axis=-1), vert_d)

    sdf = jnp.where(inside, -dist, dist)
    aa = jnp.clip(0.5 - sdf, 0.0, 1.0)
    return aa.reshape(shape), inside.reshape(shape)


def ellipse_coverage(transform, rx, ry, px, py):
    """Coverage of an ellipse (radii rx, ry about the local origin) under an
    affine ``transform`` (local -> screen), evaluated analytically.

    The reference draws ellipses as 100-step polygons (agg::ellipse,
    MovingObjectEllipse::renderMasks, cpp:459-479); the analytic conic is the
    exact limit of that approximation. Inside test: |S^-1 p| <= 1 where S maps
    the unit circle to the screen-space ellipse. AA distance: first-order
    estimate (|u| - 1) / |J^-T u_hat| which is exact on the boundary normal.
    """
    inv = affine.invert(transform)
    ux = (inv[0, 0] * px + inv[0, 1] * py + inv[0, 2]) / rx
    uy = (inv[1, 0] * px + inv[1, 1] * py + inv[1, 2]) / ry
    r = jnp.sqrt(ux * ux + uy * uy)
    inside = r <= 1.0

    # Gradient of r(p) in screen space: J^T u_hat with J = d(u)/d(p).
    safe_r = jnp.maximum(r, 1e-6)
    gx = (inv[0, 0] / rx) * (ux / safe_r) + (inv[1, 0] / ry) * (uy / safe_r)
    gy = (inv[0, 1] / rx) * (ux / safe_r) + (inv[1, 1] / ry) * (uy / safe_r)
    gnorm = jnp.sqrt(gx * gx + gy * gy)
    sdf = (r - 1.0) / jnp.maximum(gnorm, 1e-9)
    aa = jnp.clip(0.5 - sdf, 0.0, 1.0)
    return aa, inside


def combine_additive(acc_aa, acc_in, aa, inside):
    """Screen-algebra union: u | v (MovingObjectComposite::renderMasks additive
    branch, cpp:602-621: u = 255*(1-(1-u)(1-v)))."""
    return 1.0 - (1.0 - acc_aa) * (1.0 - aa), acc_in | inside


def combine_subtractive(acc_aa, acc_in, aa, inside):
    """Screen-algebra subtraction: u & ~v (cpp:622-642: u = 255*u*(1-v))."""
    return acc_aa * (1.0 - aa), acc_in & ~inside
