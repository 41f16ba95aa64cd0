"""Mosaic warp-field composition kernels (warpfields/pallas_fields.py) vs the
XLA quad-gather composition (warpfields/fields.py), in Pallas interpreter mode.

The banded kernels replace dense bilinear gathers with two-pass separable
warps whose column inverse is solved on a 4x-coarse lattice; tolerances below
bound that approximation against the exact composition. The boundary strip
differs by construction (the banded taps zero outside the plane where the XLA
path clamps), so comparisons exclude a margin — the bank's crop tiling never
reads it either (crop_origins starts at W/4, generator.py:28-34).
"""

import jax
import jax.numpy as jnp
import numpy as np

from flowgen.random.streams import root_key, stream_key, Stream
from flowgen.warpfields import fields
from flowgen.warpfields import pallas_fields as pf


def _smooth_field(key, s, mag=8.0):
    """A sigma~50 px smooth random field with |f| <= ~mag px, via the real
    displacer machinery (many doublings applied analytically: scale up the
    elementary magnitudes instead of iterating)."""
    grid = fields.sample_displacer_grid(key, s)
    f = fields.elementary_field(grid, s, inverse=False)
    scale = mag / jnp.maximum(jnp.max(jnp.abs(f)), 1e-9)
    return f * scale


def test_coarse_gdisp_matches_fixed_point():
    s = 256
    D = _smooth_field(root_key(5), s, mag=6.0)
    gd = pf.coarse_gdisp(D, interpret=True)
    assert gd.shape == (s, s)

    # Reference: full-resolution fixed point, dense bilinear.
    from flowgen.ops import texture as tex
    yy, xx = jnp.meshgrid(
        jnp.arange(s, dtype=jnp.float32),
        jnp.arange(s, dtype=jnp.float32),
        indexing="ij",
    )
    y = yy
    for _ in range(12):
        d = tex.sample_bilinear(D[..., 1:2], xx, y, wrap="clamp")[..., 0]
        y = yy - d
    ref = tex.sample_bilinear(D[..., 0:1], xx, y, wrap="clamp")[..., 0]

    m = 16
    err = np.abs(np.asarray(gd) - np.asarray(ref))[m:-m, m:-m]
    assert np.median(err) < 0.05
    assert err.max() < 0.5


def test_self_compose_matches_xla():
    s = 256
    f0 = _smooth_field(root_key(7), s, mag=0.25)
    ref = fields.self_compose(f0, iters=5)
    out = pf.self_compose_pallas(f0, 5, interpret=True)

    rn = np.asarray(ref)
    on = np.asarray(out)
    # NaN flags (OOB pixels) may differ along the flag boundary only.
    nan_r = np.isnan(rn[..., 0])
    nan_o = np.isnan(on[..., 0])
    assert (nan_r != nan_o).mean() < 0.01
    both = ~nan_r & ~nan_o
    m = 16
    both[:m] = both[-m:] = both[:, :m] = both[:, -m:] = False
    err = np.abs(rn - on)[both]
    mag = np.abs(rn[both]).max()
    assert mag > 1.0  # the composition actually grew the field
    assert np.median(err) < 0.02 * mag
    assert err.max() < 0.1 * mag


def test_make_big_field_pallas_matches_xla():
    s = 384
    key = stream_key(root_key(3), Stream.WARP_FIELD, 0)
    flow_r, iflow_r = fields.make_big_field(key, s)
    flow_p, iflow_p = pf.make_big_field_pallas(key, s, interpret=True)

    for r, p in ((flow_r, flow_p), (iflow_r, iflow_p)):
        rn, pn = np.asarray(r), np.asarray(p)
        nan_r, nan_o = np.isnan(rn[..., 0]), np.isnan(pn[..., 0])
        assert (nan_r != nan_o).mean() < 0.02
        both = ~nan_r & ~nan_o
        m = s // 4  # the bank only crops inside this margin
        both[:m] = both[-m:] = both[:, :m] = both[:, -m:] = False
        err = np.abs(rn - pn)[both]
        mag = max(np.abs(rn[both]).max(), 1e-6)
        assert np.median(err) < 0.03 * mag
        assert np.quantile(err, 0.99) < 0.15 * mag


def test_coarse_gdisp_batch_rect():
    key = root_key(11)
    D0 = _smooth_field(key, 256, mag=6.0)
    D = jnp.stack([D0[:128, :, :], D0[128:, :, :]])  # (2, 128, 256, 2)
    gd = pf.coarse_gdisp_batch(D, interpret=True)
    assert gd.shape == (2, 128, 256)
    # Each batch entry must equal the single-field solve of its own field.
    for k in range(2):
        ref = pf.coarse_gdisp_batch(D[k : k + 1], interpret=True)[0]
        assert np.allclose(np.asarray(gd[k]), np.asarray(ref), atol=1e-5)


def test_bg_upscale_matches_gathers():
    from flowgen.ops import texture as tex
    from flowgen.warpfields import generator as warpgen

    key = root_key(13)
    iflo = _smooth_field(key, 256, mag=6.0)[None, :128, :128]  # (1,128,128,2)
    bg_ey = 24
    out = warpgen.bg_upscale(iflo, bg_ey)
    H, W = 128, 128
    ys = jnp.arange(-bg_ey, H + bg_ey, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    u = (xx + W / 2.0 + 0.5) / 2.0 - 0.5
    v = (yy + H / 2.0 + 0.5) / 2.0 - 0.5
    ref = 2.0 * tex.sample_bilinear(iflo[0], u, v, wrap="clamp")
    assert out.shape == (1, H + 2 * bg_ey, W, 2)
    assert np.allclose(np.asarray(out[0]), np.asarray(ref), atol=1e-5)


def test_make_warp_aux_pallas_matches_xla():
    """The banded-kernel aux preprocess tracks the XLA gather fallback to the
    coarse-lattice interpolation error (sub-0.1 px on sigma~50 fields)."""
    from flowgen.compose.render import WarpBank
    from flowgen.warpfields import generator as warpgen

    key = root_key(17)
    f = _smooth_field(key, 256, mag=6.0)
    i = -f  # adequate stand-in inverse for a smooth small field
    bank = WarpBank(flow=f[None], iflow=i[None])
    obj_p, bg_p = warpgen.make_warp_aux(bank, use_pallas=True,
                                        interpret=True)
    obj_x, bg_x = warpgen.make_warp_aux(bank, use_pallas=False)
    assert obj_p.shape == obj_x.shape and bg_p.shape == bg_x.shape
    # Planes 1-3 (vdisp + forward field) are copies — identical.
    assert np.allclose(np.asarray(obj_p[:, 1:]), np.asarray(obj_x[:, 1:]),
                       atol=1e-5)
    assert np.allclose(np.asarray(bg_p[:, 1]), np.asarray(bg_x[:, 1]),
                       atol=1e-5)
    # gdisp planes agree to the coarse-solve tolerance.
    for p, x in ((obj_p[:, 0], obj_x[:, 0]), (bg_p[:, 0], bg_x[:, 0])):
        err = np.abs(np.asarray(p) - np.asarray(x))
        assert np.median(err) < 0.05
        assert err.max() < 0.5
