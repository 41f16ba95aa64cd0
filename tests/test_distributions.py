"""Scene-level distribution tests: statistical parity of the sampled
blueprints against the reference's per-mode RNG wiring
(ObjectParametersGenerator, src/caffe/DataGenerator.cpp:1363-2001,
2105-2835). Shaper-level stats live in test_shapers.py; these tests pin the
END-TO-END composition — a transcription slip in any single ModeSpec field
(range, trigger probability, magnitude ladder) shows up here.

All fractions are estimated over >= ~10^4 objects, so binomial noise is well
under the tolerances used.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import flowgen
from flowgen.config import ELLIPSE_STEPS
from flowgen.ops import affine
from flowgen.params.sampler import sample_scene_batch
from flowgen.random.streams import root_key

W, H = 128, 96


def _scenes(mode, n, seed=0):
    cfg = flowgen.DataGenConfig(mode=mode, batch_size=n, width=W, height=H)
    s = sample_scene_batch(root_key(seed), jnp.arange(n), cfg, n_warp_slots=1)
    return s, cfg


def _np(x):
    return np.asarray(x)


def _obj_motion_stats(scenes):
    """Decompose each object's total motion into (rot, scale, tx, ty) of the
    OBJECT part by removing the conjugated background motion
    (addBackgroundMotion, cpp:324-335): motion_obj = total o bg_conj^-1."""
    bgm = scenes.background.motion                      # [B,2,3]
    bg_conj = affine.conjugate_about(bgm, W / 2.0, H / 2.0)
    inv_conj = affine.invert(bg_conj)                   # [B,2,3]
    total = scenes.objects.motion                       # [B,K,2,3]
    obj = affine.compose(total, inv_conj[:, None])
    rot = np.arctan2(_np(obj[..., 1, 0]), _np(obj[..., 0, 0]))
    det = _np(
        obj[..., 0, 0] * obj[..., 1, 1] - obj[..., 0, 1] * obj[..., 1, 0]
    )
    scale = np.sqrt(np.maximum(det, 0.0))
    return rot, scale, _np(obj[..., 0, 2]), _np(obj[..., 1, 2])


def _predicted_edge_mean(p_curve, spokes_lo=3, spokes_hi=20, n=200_000,
                         seed=0):
    """Reference segment-type walk (cpp:2305-2315) + the flattener's
    6-points-per-curve-slot rule: expected compacted outline length."""
    rng = np.random.default_rng(seed)
    total = 0.0
    cnt = 0
    for _ in range(n // 1000):
        spokes = rng.integers(spokes_lo, spokes_hi + 1, 1000)
        for s in spokes:
            pts = 1  # slot 0 (Dummy start)
            i = 1
            while i < s:
                if i < s - 1 and rng.random() < p_curve:
                    pts += 12  # Curve3 + consumed Dummy: 6 points each
                    i += 2
                else:
                    pts += 1
                    i += 1
            total += pts
            cnt += 1
    return total / cnt


class TestMode7:
    @classmethod
    def setup_class(cls):
        cls.scenes, cls.cfg = _scenes(7, 1024)
        cls.valid = _np(cls.scenes.objects.valid)
        cls.n_prims = _np(jnp.sum(cls.scenes.prims.valid, axis=2))

    def test_object_count_uniform(self):
        # generateNumberOfFgObjects = int(Uniform(16, 24)) -> 16..23 uniform
        # (cpp:2832-2835).
        n = _np(self.scenes.n_objects)
        assert n.min() >= 16 and n.max() <= 23
        hist = np.bincount(n - 16, minlength=8) / n.size
        assert np.all(np.abs(hist - 0.125) < 0.035)

    def test_composite_fraction(self):
        # Kind uniform over {ellipse, polygon, composite} (cpp:1665-1668).
        # Multi-primitive objects: composite AND (thin-outline OR parts>=2);
        # P = 1/3 * (0.2 + 0.8 * 6/7).
        multi = (self.n_prims >= 2) & self.valid
        frac = multi.sum() / self.valid.sum()
        expect = (1 / 3) * (0.2 + 0.8 * 6 / 7)
        assert abs(frac - expect) < 0.02, (frac, expect)

    def test_needle_ellipse_fraction(self):
        # Thin needle ellipses flatten to the AGG 100-gon: detectable as
        # single-prim polygons with exactly ELLIPSE_STEPS outline points.
        # P = P(ellipse) * thin_p = 1/3 * 0.2 (cpp:2462-2464).
        ne = _np(self.scenes.prims.n_edges)[..., 0]
        poly = _np(self.scenes.prims.is_poly)[..., 0]
        needle = (self.n_prims == 1) & poly & (ne == ELLIPSE_STEPS) & self.valid
        frac = needle.sum() / self.valid.sum()
        assert abs(frac - 1 / 15) < 0.012, frac

    def test_motion_triggers(self):
        # Rotation/scaling triggers: 0.7 each in mode 7 (cpp:1671-1677).
        rot, scale, _, _ = _obj_motion_stats(self.scenes)
        v = self.valid
        rot_frac = (np.abs(rot[v]) > 1e-5).mean()
        scale_frac = (np.abs(scale[v] - 1.0) > 1e-5).mean()
        assert abs(rot_frac - 0.7) < 0.025, rot_frac
        assert abs(scale_frac - 0.7) < 0.025, scale_frac
        # Hard range bounds (baseGauss maps into the closed range).
        assert np.abs(rot[v]).max() <= np.deg2rad(30) + 1e-4
        assert scale[v].min() >= 0.8 - 1e-4 and scale[v].max() <= 1.2 + 1e-4

    def test_translation_shape(self):
        # Gaussian3 (signed cube) in [-120, 120] (cpp:1669-1670): compare
        # empirical quantiles against a direct numpy simulation of the shaper
        # (baseGauss normalizer 10, gaussian_cube — random/shapers.py).
        _, _, tx, ty = _obj_motion_stats(self.scenes)
        t = np.concatenate([tx[self.valid], ty[self.valid]])
        assert np.abs(t).max() <= 120.0 + 1e-3
        rng = np.random.default_rng(1)
        z = rng.normal(size=200_000)
        raw = z**3 * (120.0 / 10.0)
        # baseGauss maps out-of-range samples to the midpoint (0), it does
        # not clamp to the edge (cpp:828-831).
        sim = np.where(np.abs(raw) <= 120.0, raw, 0.0)
        for q in (50, 75, 90, 97):
            e = np.percentile(np.abs(t), q)
            s = np.percentile(np.abs(sim), q)
            assert abs(e - s) < max(0.15 * s, 1.0), (q, e, s)

    def test_curve_fraction_via_edge_counts(self):
        # Curve3 trigger 0.33 per eligible spoke walk (cpp:2305-2315); each
        # curve pair flattens to 12 points vs 1 per line spoke. Exclude
        # needle-ellipse 100-gons.
        ne = _np(self.scenes.prims.n_edges)[..., 0]
        poly = _np(self.scenes.prims.is_poly)[..., 0]
        sel = (self.n_prims == 1) & poly & (ne != ELLIPSE_STEPS) & self.valid
        mean_edges = ne[sel].mean()
        expect = _predicted_edge_mean(0.33)
        assert abs(mean_edges - expect) < 0.05 * expect, (mean_edges, expect)

    def test_background_triggers(self):
        # bg rot trigger 0.3, scale trigger 0.6, Gaussian4 trans in [-40,40]
        # (cpp:1658-1663).
        bgm = self.scenes.background.motion
        rot = np.arctan2(_np(bgm[:, 1, 0]), _np(bgm[:, 0, 0]))
        det = _np(bgm[:, 0, 0] * bgm[:, 1, 1] - bgm[:, 0, 1] * bgm[:, 1, 0])
        scale = np.sqrt(np.maximum(det, 0))
        assert abs((np.abs(rot) > 1e-6).mean() - 0.3) < 0.05
        assert abs((np.abs(scale - 1) > 1e-6).mean() - 0.6) < 0.05
        t = np.concatenate([_np(bgm[:, 0, 2]), _np(bgm[:, 1, 2])])
        assert np.abs(t).max() <= 40.0 * np.sqrt(2) + 1e-3  # rotated frame


@pytest.mark.parametrize(
    "mode,trans_ratio,rot_p,bg_rot_p",
    [
        (10, 0.5, 0.539, 0.176),
        (11, 2.0, 0.824, 0.462),
        (12, 1.0 / 3.0, 0.437, 0.125),
        (13, 3.0, 0.875, 0.563),
    ],
)
def test_magnitude_ladder(mode, trans_ratio, rot_p, bg_rot_p):
    """Modes 10-13 = mode 7 with motion magnitudes x 1/2, 2, 1/3, 3 and the
    hand-rescaled trigger ratios (cpp:1802-2002). The quantile ratioic of the
    shared Gaussian3 shape makes the magnitude check exact up to noise."""
    base, _ = _scenes(7, 512, seed=5)
    s, _ = _scenes(mode, 512, seed=5)
    vb = _np(base.objects.valid)
    vm = _np(s.objects.valid)

    _, _, txb, _ = _obj_motion_stats(base)
    rot, scale, tx, _ = _obj_motion_stats(s)
    q_base = np.percentile(np.abs(txb[vb]), 90)
    q_mode = np.percentile(np.abs(tx[vm]), 90)
    assert abs(q_mode / q_base - trans_ratio) < 0.15 * trans_ratio, (
        q_mode, q_base
    )

    rot_frac = (np.abs(rot[vm]) > 1e-5).mean()
    assert abs(rot_frac - rot_p) < 0.03, rot_frac

    bgm = s.background.motion
    brot = np.arctan2(_np(bgm[:, 1, 0]), _np(bgm[:, 0, 0]))
    assert abs((np.abs(brot) > 1e-6).mean() - bg_rot_p) < 0.06


def test_mode1_rect_translation_only():
    s, _ = _scenes(1, 256)
    rot, scale, _, _ = _obj_motion_stats(s)
    v = _np(s.objects.valid)
    assert np.abs(rot[v]).max() < 1e-5
    assert np.abs(scale[v] - 1).max() < 1e-5
    # Axis-aligned 4-point rectangles.
    ne = _np(s.prims.n_edges)[..., 0]
    assert np.all(ne[v] == 4)
