"""Rasterizer tests (flowgen/ops/raster.py): exact-area coverage vs a
supersampled winding oracle, thin-needle exactness, ellipse analytics, mask
algebra (reference MovingObject* rendering via AGG exact scanline coverage,
src/caffe/DataGenerator.cpp:351-368, 455-534, 591-646)."""

import jax.numpy as jnp
import numpy as np

from flowgen.ops import affine, raster


def _square(cx, cy, half):
    return jnp.array(
        [
            [cx - half, cy - half],
            [cx + half, cy - half],
            [cx + half, cy + half],
            [cx - half, cy + half],
        ],
        jnp.float32,
    )


def _winding(pts, px, py):
    """Scalar winding number at sample points."""
    pts = np.asarray(pts)
    n = len(pts)
    wn = np.zeros(px.shape, np.int32)
    for i in range(n):
        a, b = pts[i], pts[(i + 1) % n]
        d = b - a
        cross = d[0] * (py - a[1]) - d[1] * (px - a[0])
        up = (a[1] <= py) & (b[1] > py) & (cross > 0)
        dn = (b[1] <= py) & (a[1] > py) & (cross < 0)
        wn += up.astype(np.int32) - dn.astype(np.int32)
    return wn


def _ss_area(pts, px, py, n=16):
    """Supersampled coverage oracle: clip(|mean winding over an n x n
    subsample grid|, 0, 1) — brute force for AGG's per-cell signed cover
    accumulation (fill_non_zero takes |signed area|, so opposite windings in
    one cell cancel), accurate to ~ perimeter/(2n) per cell. Validates the
    analytic Green's-theorem accumulation independently."""
    offs = (np.arange(n) + 0.5) / n - 0.5
    acc = np.zeros(px.shape)
    for oy in offs:
        for ox in offs:
            acc += _winding(pts, px + ox, py + oy)
    return np.clip(np.abs(acc / (n * n)), 0.0, 1.0)


def test_square_binary_coverage():
    px, py = raster.pixel_grid(64, 48)
    aa, inside = raster.polygon_coverage(_square(20.0, 15.0, 10.0), px, py)
    inside = np.asarray(inside)
    # Pixel centers strictly inside [10,30]x[5,25] -> pixels 10..29 x 5..24.
    expect = np.zeros_like(inside)
    expect[5:25, 10:30] = True
    np.testing.assert_array_equal(inside, expect)
    # Interior AA is fully opaque, exterior fully transparent.
    assert np.asarray(aa)[15, 20] == 1.0
    assert np.asarray(aa)[40, 50] == 0.0


def test_halfpixel_edge_aa():
    # An edge exactly through pixel centers gives 0.5 AA coverage there:
    # square [0.5, 16.5]^2 has its right edge on the center column of x=16.
    px, py = raster.pixel_grid(32, 32)
    aa, _ = raster.polygon_coverage(_square(8.5, 8.5, 8.0), px, py)
    np.testing.assert_allclose(np.asarray(aa)[8, 16], 0.5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(aa)[16, 8], 0.5, atol=1e-4)


def test_random_polygon_matches_supersampled_area():
    rng = np.random.default_rng(0)
    px, py = raster.pixel_grid(96, 80)
    for _ in range(3):
        n = rng.integers(3, 12)
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(10, 35, n)
        pts = np.stack([48 + r * np.cos(ang), 40 + r * np.sin(ang)], -1).astype(
            np.float32
        )
        aa, inside = raster.polygon_coverage(jnp.asarray(pts), px, py)
        ss = _ss_area(pts, np.asarray(px), np.asarray(py))
        # Exact area vs 16x16 brute force: bounded by the oracle's own
        # quantization on edge cells.
        np.testing.assert_allclose(np.asarray(aa), ss, atol=0.05)
        # Binary mask = area >= 0.5 (AGG gamma_threshold), checked away from
        # the oracle's quantization band around the knife edge.
        sure = np.abs(ss - 0.5) > 0.05
        np.testing.assert_array_equal(
            np.asarray(inside)[sure], (ss >= 0.5)[sure]
        )


def test_thin_needle_exact_area():
    # A 0.4-px-wide, 20-px-tall rectangle: each fully-spanned cell covers
    # exactly 0.4. The SDF ramp this replaced reported ~0.7 (0.5 + width/2) —
    # the systematic overestimate on mode-7 thin needles (VERDICT r1 #4).
    pts = jnp.array(
        [[10.3, 5.0], [10.7, 5.0], [10.7, 25.0], [10.3, 25.0]], jnp.float32
    )
    px, py = raster.pixel_grid(32, 32)
    aa, inside = raster.polygon_coverage(pts, px, py)
    aa = np.asarray(aa)
    np.testing.assert_allclose(aa[15, 10], 0.4, atol=1e-5)
    assert not np.asarray(inside)[15, 10]  # 0.4 < 0.5: below threshold
    # Total area is exact: 0.4 x 20.
    np.testing.assert_allclose(aa.sum(), 8.0, atol=1e-4)
    # Horizontal needle spanning a cell-interior strip likewise.
    ptsh = jnp.array(
        [[5.0, 20.2], [25.0, 20.2], [25.0, 20.5], [5.0, 20.5]], jnp.float32
    )
    aah, _ = raster.polygon_coverage(ptsh, px, py)
    np.testing.assert_allclose(np.asarray(aah)[20, 15], 0.3, atol=1e-5)


def test_degenerate_padding_points_are_inert():
    px, py = raster.pixel_grid(64, 48)
    sq = _square(20.0, 15.0, 10.0)
    padded = jnp.concatenate([sq, jnp.tile(sq[:1], (10, 1))], axis=0)
    aa0, in0 = raster.polygon_coverage(sq, px, py)
    aa1, in1 = raster.polygon_coverage(padded, px, py)
    np.testing.assert_array_equal(np.asarray(in0), np.asarray(in1))
    np.testing.assert_allclose(np.asarray(aa0), np.asarray(aa1), atol=1e-5)


def test_nonconvex_winding():
    # Self-intersecting bowtie: nonzero winding fills both lobes (signed area
    # contributions with opposite windings cancel; same-sign double winding
    # clips to 1 — AGG fill_non_zero).
    pts = jnp.array([[10.3, 10.1], [30.2, 29.7], [30.1, 10.2], [10.2, 29.8]])
    px, py = raster.pixel_grid(40, 40)
    aa, inside = raster.polygon_coverage(pts, px, py)
    ss = _ss_area(np.asarray(pts), np.asarray(px), np.asarray(py))
    np.testing.assert_allclose(np.asarray(aa), ss, atol=0.05)
    sure = np.abs(ss - 0.5) > 0.05
    np.testing.assert_array_equal(np.asarray(inside)[sure], (ss >= 0.5)[sure])


def _gon_reference(t, rx, ry, px, py, steps=100):
    """The reference's literal geometry: the inscribed ``steps``-gon
    (agg::ellipse, cpp:1080), exact-area rasterized; plus the set of pixels
    whose cell contains a gon vertex (where the single-chord formula is
    allowed its corner-sliver deviation)."""
    ang = np.arange(steps) * (2 * np.pi / steps)
    local = np.stack([rx * np.cos(ang), ry * np.sin(ang)], -1).astype(
        np.float32
    )
    pts = affine.apply(t, jnp.asarray(local))
    ref_aa, ref_in = raster.polygon_coverage(pts, px, py)
    vp = np.floor(np.asarray(pts)).astype(np.int64)
    vertex_cells = np.zeros(px.shape, bool)
    H, W = px.shape
    ok = (vp[:, 0] >= 0) & (vp[:, 0] < W) & (vp[:, 1] >= 0) & (vp[:, 1] < H)
    # A vertex influences its own cell and (via chord selection at centers)
    # the 8-neighborhood.
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            yy = np.clip(vp[ok, 1] + dy, 0, H - 1)
            xx = np.clip(vp[ok, 0] + dx, 0, W - 1)
            vertex_cells[yy, xx] = True
    return np.asarray(ref_aa), np.asarray(ref_in), vertex_cells


def test_ellipse_circle_matches_gon():
    px, py = raster.pixel_grid(64, 64)
    t = affine.translation(32.0, 32.0)
    aa, inside = raster.ellipse_coverage(t, 10.0, 10.0, px, py)
    ref_aa, ref_in, _ = _gon_reference(t, 10.0, 10.0, px, py)
    # 3-chord lower-envelope coverage: identical to the full 100-gon
    # rasterization INCLUDING vertex cells (the r4 single-chord corner
    # sliver is gone); at r=10 a 4th chord grazes a cell only at the
    # sub-1e-3 level (tests below the needle threshold pin the residual).
    np.testing.assert_allclose(np.asarray(aa), ref_aa, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(inside), ref_in)
    assert abs(np.asarray(aa).sum() - ref_aa.sum()) < 0.05


def test_ellipse_under_rotation_scale_matches_gon():
    px, py = raster.pixel_grid(128, 96)
    t = affine.chain(
        affine.rotation(np.pi / 4), affine.scaling(1.5), affine.translation(64.0, 48.0)
    )
    aa, inside = raster.ellipse_coverage(t, 20.0, 8.0, px, py)
    # Area scales by det = 1.5^2.
    np.testing.assert_allclose(
        np.asarray(aa).sum(), np.pi * 20 * 8 * 2.25, rtol=0.02
    )
    # Screen radii 30 x 12 after the 1.5x scale: 3-chord-exact territory —
    # the polygon path's own tolerance, vertex cells included.
    ref_aa, ref_in, _ = _gon_reference(t, 20.0, 8.0, px, py)
    np.testing.assert_allclose(np.asarray(aa), ref_aa, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(inside), ref_in)


def test_ellipse_small_radius_residual_bounded():
    """Shrunk composite parts (component_shrink=0.2 of radii 25..100,
    cpp:2384-2428) can reach screen radii ~5 px, where a cell spans more
    than the 3 evaluated chords' sectors (arc = 2*pi*r/100 < cell size).
    The 3-chord envelope must stay within a few 1e-3 of the literal gon
    there and keep binary flips to isolated threshold pixels."""
    rng = np.random.default_rng(7)
    worst, flips = 0.0, 0
    px, py = raster.pixel_grid(64, 64)
    for r in (5.0, 8.0):
        for _ in range(4):
            ang = float(rng.uniform(0, 2 * np.pi))
            ca, sa = np.cos(ang), np.sin(ang)
            cx, cy = rng.uniform(20, 40, 2)
            t = jnp.asarray([[ca, -sa, cx], [sa, ca, cy]], jnp.float32)
            aa, inside = raster.ellipse_coverage(t, r, r, px, py)
            ref_aa, ref_in, _ = _gon_reference(t, r, r, px, py)
            worst = max(worst, float(np.abs(np.asarray(aa) - ref_aa).max()))
            flips += int((np.asarray(inside) != ref_in).sum())
    assert worst < 8e-3
    assert flips <= 2


def test_mask_algebra():
    px, py = raster.pixel_grid(64, 48)
    aa_a, in_a = raster.polygon_coverage(_square(20.0, 15.0, 10.0), px, py)
    aa_b, in_b = raster.polygon_coverage(_square(24.0, 15.0, 6.0), px, py)
    acc_aa, acc_in = raster.combine_additive(
        jnp.zeros_like(aa_a), jnp.zeros_like(in_a), aa_a, in_a
    )
    acc_aa, acc_in = raster.combine_subtractive(acc_aa, acc_in, aa_b, in_b)
    acc_in = np.asarray(acc_in)
    assert not acc_in[15, 24]          # hole
    assert acc_in[15, 12]              # remaining ring
    assert not acc_in[40, 50]          # outside
    # subtractive AA: u * (1 - v)
    np.testing.assert_allclose(
        np.asarray(acc_aa), np.asarray(aa_a * (1.0 - aa_b)), atol=1e-6
    )
