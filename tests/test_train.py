"""FlowNet demo trainer tests: fused generate+train step runs and learns,
checkpoint roundtrip, adapters."""

import jax
import jax.numpy as jnp
import numpy as np

import flowgen
from flowgen.random.streams import root_key
from flowgen.train import flownet


def test_fused_generate_and_train_step_decreases_loss(tmp_path):
    H, W = 64, 128
    cfg = flowgen.DataGenConfig(mode=1, batch_size=2, width=W, height=H, seed=0)
    atlas = jnp.asarray(flowgen.procedural_atlas(2, height=H, width=W))
    model = flownet.create_model(width=4)
    params = flownet.init_params(model, jax.random.key(0), H, W)
    tx = flownet.make_optimizer(1e-3)
    opt_state = tx.init(params)
    fused = jax.jit(flownet.make_generate_and_train_step(cfg, model, tx))

    root = root_key(0)
    losses = []
    for _ in range(16):
        # overfit one fixed batch (step 0): loss must come down
        params, opt_state, loss = fused(
            root, jnp.int32(0), atlas, params, opt_state
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])

    # checkpoint roundtrip preserves params and the resumable step counter
    from flowgen.train import checkpoints

    ckdir = str(tmp_path / "ck")
    checkpoints.save_checkpoint(ckdir, 8, params, opt_state)
    restored = checkpoints.restore_checkpoint(ckdir)
    assert restored["step"] == 8
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_adapters(tmp_path):
    from flowgen.pipeline import adapters

    H, W = 64, 96
    cfg = flowgen.DataGenConfig(mode=1, batch_size=1, width=W, height=H)
    gen = flowgen.Generator(
        cfg, atlas=flowgen.procedural_atlas(2, height=H, width=W)
    )
    it = adapters.as_numpy_iterator(gen)
    batch = next(it)
    assert isinstance(batch["image0"], np.ndarray)
    i0, i1, f0 = adapters.caffe_style_tops(batch)
    assert i0.shape == (1, H, W, 3) and f0.shape == (1, H, W, 2)

    import torch

    tbatch = next(adapters.as_torch_iterator(gen))
    assert isinstance(tbatch["image0"], torch.Tensor)
    gen.stop()
