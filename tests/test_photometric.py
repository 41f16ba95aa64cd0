"""Photometric augmentation stage (ops/photometric.py).

The stage must jitter appearance without invalidating the geometric ground
truth (flow/scene content identical to the unaugmented run), stay
deterministic in (seed, step), and keep outputs in range.
"""

import jax.numpy as jnp
import numpy as np

import flowgen
from flowgen.pipeline.generator import generate_batch
from flowgen.random.streams import root_key


def _run(photometric, seed=5, batch=2):
    cfg = flowgen.DataGenConfig(
        mode=7, batch_size=batch, width=128, height=96, seed=seed,
        use_pallas="never", photometric_augment=photometric,
    )
    atlas = jnp.asarray(
        flowgen.procedural_atlas(3, height=96, width=128), jnp.float32
    )
    return generate_batch(root_key(seed), jnp.int32(0), atlas, cfg)


def test_flow_and_scene_content_unchanged():
    raw = _run(False)
    aug = _run(True)
    # Geometry is untouched: identical flow; appearance is jittered.
    np.testing.assert_array_equal(np.asarray(raw["flow0"]),
                                  np.asarray(aug["flow0"]))
    assert not np.allclose(np.asarray(raw["image0"]),
                           np.asarray(aug["image0"]))
    assert not np.allclose(np.asarray(raw["image1"]),
                           np.asarray(aug["image1"]))


def test_range_and_determinism():
    a = _run(True)
    b = _run(True)
    for k in ("image0", "image1"):
        img = np.asarray(a[k])
        assert np.isfinite(img).all()
        assert img.min() >= 0.0 and img.max() <= 255.0
        np.testing.assert_array_equal(img, np.asarray(b[k]))
    # Distinct samples draw distinct jitter.
    i0 = np.asarray(a["image0"])
    assert not np.allclose(i0[0], i0[1])


def test_pair_shares_transform_noise_differs():
    """The shared map must be identical across the pair: feeding the SAME
    image as both frames, the outputs differ only by the independent
    per-frame noise (bounded by a few noise sigmas), not by color/gamma/
    contrast-scale differences."""
    import jax

    from flowgen.ops import photometric

    key = jax.random.key(7)
    img = jnp.asarray(
        flowgen.procedural_atlas(1, height=64, width=128), jnp.float32
    )[0]
    o0, o1 = photometric.augment_pair(key, img, img)
    d = np.abs(np.asarray(o0) - np.asarray(o1))
    # max |noise diff| <= ~8 sigma of the max noise level (0.04 * 255 ~ 10).
    assert d.max() < 8.0 * 0.04 * 255.0
    assert d.mean() > 0.0  # noise actually independent


def test_stream_layout_untouched():
    """Enabling the stage must not reshuffle scene content: the aux id is
    outside the Stream bits-table layout."""
    from flowgen.ops.photometric import AUX_PHOTOMETRIC
    from flowgen.random.streams import Stream

    assert AUX_PHOTOMETRIC not in set(int(s) for s in Stream)
