"""Disparity-pair generation (config.disparity_mode): the sibling capability
of the IJCV paper's framework — same scene machinery, motion restricted to
horizontal translation so (image0, image1) form a rectified stereo pair and
disparity = -flow_x. (The reference repo is flow-only; this is an extension.)"""

import jax.numpy as jnp
import numpy as np

import flowgen
from flowgen.random.streams import root_key


def test_disparity_mode():
    mode = flowgen.config.disparity_mode(7)
    assert mode == 107
    cfg = flowgen.DataGenConfig(mode=mode, batch_size=2, width=128, height=96)
    out = flowgen.make_generate_fn(cfg)(
        root_key(0), jnp.int32(0),
        jnp.asarray(flowgen.procedural_atlas(3, height=96, width=128),
                    jnp.float32),
    )
    flow = np.asarray(out["flow0"])
    # Rectified: zero vertical flow everywhere.
    np.testing.assert_allclose(flow[..., 1], 0.0, atol=1e-4)
    assert np.abs(flow[..., 0]).max() > 1.0       # real horizontal motion
    np.testing.assert_allclose(
        np.asarray(out["disparity"]), -flow[..., 0], atol=1e-6
    )
    assert np.isfinite(np.asarray(out["image1"])).all()


def test_disparity_mode_id_autoregister():
    cfg = flowgen.DataGenConfig(mode=105)
    assert cfg.mode_spec.horizontal_only
    assert cfg.mode_spec.obj_rot_p == 0.0
