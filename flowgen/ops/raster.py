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
params/sampler.flatten_outline). Ellipses are handled analytically in closed
form via a signed-distance ramp — the reference approximates them as 100-gons
(agg::ellipse with 100 steps, cpp:1080) and then area-rasterizes those; for
well-conditioned ellipses the two agree to a few percent on edge pixels only.
Thin "needle" ellipses (whose sub-pixel width an SDF ramp cannot measure) are
flattened to the reference's literal 100-gon at sampling time and take the
exact-area polygon path (params/sampler.py).

All functions return ``(aa, inside)`` where ``aa`` is float coverage in [0,1]
and ``inside`` the binary mask, both shaped like the pixel grid.
"""

from __future__ import annotations

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


def ellipse_coverage(transform, rx, ry, px, py):
    """Coverage of an ellipse (radii rx, ry about the local origin) under an
    affine ``transform`` (local -> screen), evaluated analytically.

    The reference draws ellipses as 100-step polygons (agg::ellipse,
    MovingObjectEllipse::renderMasks, cpp:459-479); the analytic conic is the
    smooth limit of that approximation. Inside test: |S^-1 p| <= 1 where S maps
    the unit circle to the screen-space ellipse. AA: a signed-distance ramp,
    first-order estimate (|u| - 1) / |grad|, which matches exact area to a few
    percent on edge pixels of well-conditioned ellipses (thin needles take the
    exact polygon path instead — see params/sampler.py).
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
