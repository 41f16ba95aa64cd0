"""Custom scene-recipe registration (flowgen.register_mode): the data-driven
analog of the reference's "add a case to the switch" extension point
(README.md:42)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import flowgen
from flowgen.random.streams import root_key


def test_register_and_render_custom_mode():
    base = flowgen.MODES[7]
    spec = dataclasses.replace(
        base,
        mode=101,
        # giant translations, ellipses only, no thin objects
        obj_trans_range=(-300.0, 300.0),
        obj_types=(flowgen.KIND_ELLIPSE,),
        use_thin=False,
    )
    if 101 not in flowgen.MODES:
        flowgen.register_mode(spec)
    with pytest.raises(ValueError):
        flowgen.register_mode(spec)  # duplicate id rejected

    cfg = flowgen.DataGenConfig(mode=101, batch_size=2, width=128, height=96)
    atlas = jnp.asarray(flowgen.procedural_atlas(2, height=96, width=128))
    out = flowgen.make_generate_fn(cfg)(root_key(0), jnp.int32(0), atlas)
    f = np.asarray(out["flow0"])
    assert np.isfinite(f).all()
    # bigger translations than stock mode 7 on average
    cfg7 = flowgen.DataGenConfig(mode=7, batch_size=2, width=128, height=96)
    f7 = np.asarray(
        flowgen.make_generate_fn(cfg7)(root_key(0), jnp.int32(0), atlas)["flow0"]
    )
    assert np.percentile(np.abs(f), 95) > np.percentile(np.abs(f7), 95)


def test_unknown_mode_rejected():
    with pytest.raises(ValueError):
        flowgen.DataGenConfig(mode=999)
