"""Rasterizer tests (flowgen/ops/raster.py): winding exactness vs a scalar
NumPy oracle, AA behavior, ellipse analytics, mask algebra (reference
MovingObject* rendering, src/caffe/DataGenerator.cpp:351-368, 455-534, 591-646)."""

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


def _oracle_inside(pts, px, py):
    """Scalar even-odd/nonzero winding oracle (matches the kernel's rule)."""
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
    return wn != 0


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


def test_random_polygon_matches_oracle():
    rng = np.random.default_rng(0)
    px, py = raster.pixel_grid(96, 80)
    for _ in range(5):
        n = rng.integers(3, 12)
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(10, 35, n)
        pts = np.stack([48 + r * np.cos(ang), 40 + r * np.sin(ang)], -1).astype(
            np.float32
        )
        _, inside = raster.polygon_coverage(jnp.asarray(pts), px, py)
        expect = _oracle_inside(pts, np.asarray(px), np.asarray(py))
        np.testing.assert_array_equal(np.asarray(inside), expect)


def test_degenerate_padding_points_are_inert():
    px, py = raster.pixel_grid(64, 48)
    sq = _square(20.0, 15.0, 10.0)
    padded = jnp.concatenate([sq, jnp.tile(sq[:1], (10, 1))], axis=0)
    aa0, in0 = raster.polygon_coverage(sq, px, py)
    aa1, in1 = raster.polygon_coverage(padded, px, py)
    np.testing.assert_array_equal(np.asarray(in0), np.asarray(in1))
    np.testing.assert_allclose(np.asarray(aa0), np.asarray(aa1), atol=1e-5)


def test_nonconvex_winding():
    # Self-intersecting bowtie: nonzero winding fills both lobes. Vertices are
    # off-lattice so no pixel center lies exactly on an edge (degenerate
    # cross==0 cases are f32-rounding-dependent and excluded by design).
    pts = jnp.array([[10.3, 10.1], [30.2, 29.7], [30.1, 10.2], [10.2, 29.8]])
    px, py = raster.pixel_grid(40, 40)
    _, inside = raster.polygon_coverage(pts, px, py)
    expect = _oracle_inside(pts, np.asarray(px), np.asarray(py))
    np.testing.assert_array_equal(np.asarray(inside), expect)


def test_ellipse_circle_coverage():
    px, py = raster.pixel_grid(64, 64)
    t = affine.translation(32.0, 32.0)
    aa, inside = raster.ellipse_coverage(t, 10.0, 10.0, px, py)
    inside = np.asarray(inside)
    dist = np.hypot(np.asarray(px) - 32.0, np.asarray(py) - 32.0)
    np.testing.assert_array_equal(inside, dist <= 10.0)
    # AA ~0.5 at the rim.
    rim = np.abs(dist - 10.0) < 0.05
    assert np.all(np.abs(np.asarray(aa)[rim] - 0.5) < 0.1)
    # Area matches pi r^2 within a pixel's worth.
    assert abs(np.asarray(aa).sum() - np.pi * 100.0) < 8.0


def test_ellipse_under_rotation_scale():
    px, py = raster.pixel_grid(128, 96)
    t = affine.chain(
        affine.rotation(np.pi / 4), affine.scaling(1.5), affine.translation(64.0, 48.0)
    )
    aa, inside = raster.ellipse_coverage(t, 20.0, 8.0, px, py)
    # Area scales by det = 1.5^2.
    np.testing.assert_allclose(
        np.asarray(aa).sum(), np.pi * 20 * 8 * 2.25, rtol=0.02
    )
    # Ellipse polygonized at 200 steps agrees with the analytic test.
    ang = np.linspace(0, 2 * np.pi, 200, endpoint=False)
    local = np.stack([20 * np.cos(ang), 8 * np.sin(ang)], -1).astype(np.float32)
    pts = affine.apply(t, jnp.asarray(local))
    _, inside_poly = raster.polygon_coverage(pts, px, py)
    assert (np.asarray(inside) != np.asarray(inside_poly)).mean() < 0.003


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
