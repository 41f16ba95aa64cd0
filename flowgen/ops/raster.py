"""Analytic coverage rasterization: the AGG replacement.

The reference rasterizes every shape with AGG's scanline engine
(``rasterizer_scanline_aa`` + ``scanline_u8``, MovingObjectBase::draw,
src/caffe/DataGenerator.cpp:351-368): anti-aliased **exact-area** coverage
with ``gamma_none``, and a binary mask via ``gamma_threshold(0.5)`` — i.e. the
binary mask keeps pixels with >= 50% area coverage. Scanlines are inherently
sequential; on TPU we instead evaluate coverage *per pixel over the whole
frame* in one fused dispatch, computing the same exact area analytically:

* **anti-aliased coverage** — exact polygon-area-in-cell via Green's theorem:
  for pixel cell C, ``area = ∮ clamp(x, C) dy`` accumulated per edge with the
  edge clipped to C's row slab. Every per-edge contribution is a closed-form
  integral of a clamped linear function, so the whole thing is branch-free
  FMA/min/max work — no scanlines, no sorting, and it matches AGG's
  scanline-accumulated cell areas exactly (up to f32 rounding and AGG's 1/256
  subpixel quantization).
* **binary (non-AA) coverage** — ``area >= 0.5``, which is literally AGG's
  ``gamma_threshold(0.5)`` applied to the exact coverage. This mask drives the
  index image and therefore the ground-truth flow (RenderCore::blitObject,
  cpp:762-774).

Nonzero-winding semantics fall out for free: contributions are signed by the
edge direction, so a doubly-wound region accumulates area 2 and clips to 1,
and opposite windings cancel — exactly AGG's ``fill_non_zero`` alpha rule.

Polygons arrive pre-flattened to ``MAX_EDGES`` points (see
params/sampler.flatten_outline). Ellipses replicate the reference's actual
geometry — the inscribed 100-gon (agg::ellipse with 100 steps, cpp:1080) —
at O(1) per pixel: each pixel snaps its parameter angle to the gon chord of
its sector and takes that chord's EXACT half-plane cell area in screen space
(ellipse_chord_coverage), agreeing with the full 100-edge rasterization
everywhere except vertex-containing cells (sub-3% corner slivers). Thin
"needle" ellipses (whose sub-pixel width spans whole cells) are flattened to
the literal 100-gon at sampling time and take the exact-area polygon path
(params/sampler.py).

All functions return ``(aa, inside)`` where ``aa`` is float coverage in [0,1]
and ``inside`` the binary mask, both shaped like the pixel grid.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from . import affine


def pixel_grid(width, height, center_offset=0.5, dtype=jnp.float32):
    """Pixel sample positions. AGG/CImg address pixel (x, y) as the unit square
    [x, x+1) x [y, y+1); coverage is evaluated at centers (+0.5) while flow is
    evaluated at integer coordinates (RenderCore::computeFlowImage uses the raw
    loop indices, cpp:807-817)."""
    ys = jnp.arange(height, dtype=dtype) + center_offset
    xs = jnp.arange(width, dtype=dtype) + center_offset
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    return px, py


def edge_cell_area(ax, ay, bx, by, px, py):
    """Signed area contribution of edge (a -> b) to the unit pixel cell
    centered at (px, py), i.e. ``∮ (clamp(x, cell) - x_lo) dy`` along the part
    of the edge inside the cell's row slab.

    Broadcasts: edge endpoints and pixel coordinates combine by normal
    broadcasting rules. Summed over a *closed* outline this yields the exact
    signed polygon area inside the cell (Green's theorem; the ``- x_lo`` shift
    is free because a closed outline's slab-clipped dy-sum is zero, and keeps
    every factor in [-1, 1] for f32 health).
    """
    dx = bx - ax
    dy = by - ay
    inv_dy = jnp.where(jnp.abs(dy) > 1e-12, 1.0 / dy, 0.0)
    inv_dx = jnp.where(jnp.abs(dx) > 1e-12, 1.0 / dx, 0.0)

    xlo = px - 0.5
    ylo = py - 0.5
    yhi = py + 0.5

    # Edge-parameter interval [ta, tb] inside the row slab (ascending).
    r0 = (ylo - ay) * inv_dy
    r1 = (yhi - ay) * inv_dy
    ta = jnp.clip(jnp.minimum(r0, r1), 0.0, 1.0)
    tb = jnp.clip(jnp.maximum(r0, r1), 0.0, 1.0)

    # Breakpoints where x(t) crosses the cell's x-faces.
    s0 = (xlo - ax) * inv_dx
    s1 = (xlo + 1.0 - ax) * inv_dx
    p = jnp.clip(jnp.minimum(s0, s1), ta, tb)
    q = jnp.clip(jnp.maximum(s0, s1), ta, tb)

    # g(t) = clamp(x(t) - xlo, 0, 1): constant on [ta,p] and [q,tb], linear
    # (unclamped) on [p,q].
    def g(t):
        return jnp.clip(ax + t * dx - xlo, 0.0, 1.0)

    integral = (
        g(ta) * (p - ta)
        + 0.5 * (g(p) + g(q)) * (q - p)
        + g(tb) * (tb - q)
    )
    return dy * integral


def polygon_coverage(edge_pts, px, py):
    """Coverage of a closed polyline against a pixel grid.

    ``edge_pts``: (E, 2) closed outline (edge e runs points e -> e+1 mod E;
    repeated points are inert). ``px``/``py``: (H, W) pixel-center positions;
    each pixel's cell is the unit square centered there.

    Returns (aa, inside):
      aa     — exact area fraction of the cell covered (nonzero winding),
               clipped to [0, 1]: AGG's scanline_u8 coverage with gamma_none.
      inside — aa >= 0.5: AGG's gamma_threshold(0.5) binary mask.
    """
    a = edge_pts
    b = jnp.roll(edge_pts, -1, axis=0)
    shape = px.shape
    pxf = px.reshape(-1, 1)
    pyf = py.reshape(-1, 1)
    contrib = edge_cell_area(
        a[None, :, 0], a[None, :, 1], b[None, :, 0], b[None, :, 1], pxf, pyf
    )
    area = jnp.abs(jnp.sum(contrib, axis=-1))
    aa = jnp.clip(area, 0.0, 1.0)
    return aa.reshape(shape), (area >= 0.5).reshape(shape)


def halfplane_cell_coverage(d, nx, ny):
    """Exact area of the unit pixel cell inside the half-plane
    ``{p : n . (p - center) <= -d}`` — i.e. ``d`` is the signed distance of
    the cell CENTER from the boundary line, positive outside, and (nx, ny)
    the unit outward normal. Closed form (piecewise quadratic in d),
    branch-free."""
    a1 = jnp.abs(nx)
    b1 = jnp.abs(ny)
    lo = jnp.minimum(a1, b1)
    hi = jnp.maximum(a1, b1)
    t = jnp.clip((a1 + b1) * 0.5 - d, 0.0, lo + hi)
    denom = jnp.maximum(2.0 * lo * hi, 1e-9)
    quad_lo = t * t / denom
    lin = (t - 0.5 * lo) / jnp.maximum(hi, 1e-9)
    quad_hi = 1.0 - (hi + lo - t) * (hi + lo - t) / denom
    aa = jnp.where(t <= lo, quad_lo, jnp.where(t >= hi, quad_hi, lin))
    return jnp.clip(aa, 0.0, 1.0)


def _sector_center_dir(ux, uy, steps: int):
    """Unit direction of the center of the ``2*pi/steps`` angular sector
    containing ``(ux, uy)`` (scale-invariant; no normalization needed).

    Trig-free — Mosaic kernels share this code with the XLA path and the
    TPU lowering has no vector atan2/sincos, so the sector is found by a
    quadrant fold plus a binary search over power-of-two sector rotations
    with PRECOMPUTED (Python-constant) cos/sin: pure FMA + select work, and
    bit-identical sector choices across both paths. ``steps`` must be a
    multiple of 4 (quadrant fold lands on sector boundaries)."""
    assert steps % 4 == 0
    delta = 2.0 * math.pi / steps
    q = steps // 4  # sectors per quadrant
    c = jnp.abs(ux)
    s = jnp.abs(uy)
    nx = jnp.full_like(c, math.cos(delta / 2.0))
    ny = jnp.full_like(c, math.sin(delta / 2.0))
    a = (1 << ((q - 1).bit_length() - 1)) if q > 1 else 0
    while a >= 1:
        ca = math.cos(a * delta)
        sa = math.sin(a * delta)
        # angle(c, s) >= a*delta? Then rotate (c, s) down and (nx, ny) up.
        pred = s * ca - c * sa >= 0.0
        c, s = (
            jnp.where(pred, c * ca + s * sa, c),
            jnp.where(pred, s * ca - c * sa, s),
        )
        nx, ny = (
            jnp.where(pred, nx * ca - ny * sa, nx),
            jnp.where(pred, ny * ca + nx * sa, ny),
        )
        a >>= 1
    nx = jnp.where(ux >= 0.0, nx, -nx)
    ny = jnp.where(uy >= 0.0, ny, -ny)
    return nx, ny


def ellipse_chord_coverage(ux, uy, jxx, jxy, jyx, jyy, steps: int = 100):
    """Per-pixel coverage of the reference's inscribed ``steps``-gon of the
    unit circle, in normalized ellipse coordinates ``(ux, uy)`` whose
    (constant) screen Jacobian is ``[[jxx, jxy], [jyx, jyy]]``.

    AGG flattens every ellipse to a 100-step polygon and area-rasterizes it
    (agg::ellipse, MovingObjectEllipse::renderMasks, cpp:455-479, 1080). Per
    pixel only the chord whose angular sector contains the pixel matters, so
    instead of accumulating 100 edges we snap the pixel's parameter angle to
    its chord and compute the EXACT cell area of that chord's half-plane in
    screen space — identical to the 100-gon's area except at the ~1/3 of
    edge pixels containing a gon vertex, where the single-chord
    approximation is off by at most the 3.6-deg corner sliver (<~3% of a
    cell, typically far less). Binary: half-plane at the cell center, AGG's
    gamma_threshold(0.5) of the same coverage.

    Returns (aa, inside)."""
    nx_u, ny_u = _sector_center_dir(ux, uy, steps)
    coshalf = math.cos(math.pi / steps)
    # Chord line in normalized coords: n . u = cos(delta/2); its screen-space
    # gradient is J^T n.
    a = nx_u * jxx + ny_u * jyx
    b = nx_u * jxy + ny_u * jyy
    norm = jnp.maximum(jnp.sqrt(a * a + b * b), 1e-9)
    l = nx_u * ux + ny_u * uy - coshalf
    d = l / norm
    aa = halfplane_cell_coverage(d, a / norm, b / norm)
    return aa, l <= 0.0


def ellipse_coverage(transform, rx, ry, px, py):
    """Coverage of an ellipse (radii rx, ry about the local origin) under an
    affine ``transform`` (local -> screen).

    Matches the reference's actual geometry — the inscribed 100-gon
    (agg::ellipse with 100 steps, cpp:1080) — via the per-pixel chord
    half-plane exact cell area (:func:`ellipse_chord_coverage`); sub-pixel
    "needle" ellipses still take the full exact-area polygon path (flattened
    at sampling time, params/sampler.py) because their entire width sits
    inside single cells where a single chord cannot measure area.
    """
    inv = affine.invert(transform)
    ux = (inv[0, 0] * px + inv[0, 1] * py + inv[0, 2]) / rx
    uy = (inv[1, 0] * px + inv[1, 1] * py + inv[1, 2]) / ry
    return ellipse_chord_coverage(
        ux, uy, inv[0, 0] / rx, inv[0, 1] / rx, inv[1, 0] / ry, inv[1, 1] / ry
    )


def combine_additive(acc_aa, acc_in, aa, inside):
    """Screen-algebra union: u | v (MovingObjectComposite::renderMasks additive
    branch, cpp:602-621: u = 255*(1-(1-u)(1-v)))."""
    return 1.0 - (1.0 - acc_aa) * (1.0 - aa), acc_in | inside


def combine_subtractive(acc_aa, acc_in, aa, inside):
    """Screen-algebra subtraction: u & ~v (cpp:622-642: u = 255*u*(1-v))."""
    return acc_aa * (1.0 - aa), acc_in & ~inside
