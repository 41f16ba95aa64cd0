"""Pallas polygon-coverage kernel vs the pure-XLA reference path
(flowgen/ops/pallas_raster.py vs ops/raster.py), run in interpreter mode on
the CPU test mesh. On-device numerical equivalence is exercised by
tools/check_pallas_tpu.py on real hardware."""

import jax.numpy as jnp
import numpy as np

from flowgen.ops import raster
from flowgen.ops.pallas_raster import polygon_coverage_pallas


def _compare(pts, n_edges, w=128, h=32):
    px, py = raster.pixel_grid(w, h)
    ref_aa, ref_in = raster.polygon_coverage(pts, px, py)
    aa, inside = polygon_coverage_pallas(
        pts, jnp.int32(n_edges), px, py, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(inside), np.asarray(ref_in))
    # The XLA path computes vertex distances via the |p|^2 - 2 a.p + |a|^2
    # matmul expansion, which cancels catastrophically compared to the
    # kernel's direct (p - a)^2; allow for that on AA edge pixels.
    np.testing.assert_allclose(np.asarray(aa), np.asarray(ref_aa), atol=5e-3)


def test_square_matches_reference():
    sq = jnp.array(
        [[20.0, 5.0], [60.0, 5.0], [60.0, 25.0], [20.0, 25.0]], jnp.float32
    )
    padded = jnp.concatenate([sq, jnp.tile(sq[:1], (12, 1))])
    _compare(padded, 4)


def test_star_with_padding_culled():
    rng = np.random.default_rng(1)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 9))
    r = rng.uniform(5, 14, 9)
    pts = np.stack([64 + r * np.cos(ang), 16 + r * np.sin(ang)], -1).astype(
        np.float32
    )
    padded = np.concatenate([pts, np.tile(pts[:1], (23, 1))])
    # Padding slots repeat point 0 and must not affect the result; the kernel
    # additionally skips them via n_edges.
    _compare(jnp.asarray(padded), 9)


def test_full_slots():
    rng = np.random.default_rng(2)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 16))
    r = rng.uniform(6, 14, 16)
    pts = np.stack([64 + r * np.cos(ang), 16 + r * np.sin(ang)], -1).astype(
        np.float32
    )
    _compare(jnp.asarray(pts), 16)
