"""FlowNet-style demo trainer: the downstream consumer of the generator.

The reference is only a data layer; its consumer was a Caffe FlowNet trained on
the generated stream (README.md:5, example-prototxt/train.prototxt feeds tops
image0/image1/flow0). This module provides the equivalent end of the pipeline
as a compact FlowNetS-like encoder/decoder (flax.linen) plus a jit-able
training step, so `flowgen` covers BASELINE.md milestone config 5: "batched
on-the-fly mode, 64-pair batches streamed on-device into a FlowNet training
loop".

Sharding: parameters carry a logical 'model' axis on conv output channels
(Megatron-style column parallelism); the batch shards over 'data'. XLA/GSPMD
inserts the collectives.
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P


class FlowNetS(nn.Module):
    """Compact FlowNetS: strided conv encoder, deconv decoder with multi-scale
    flow predictions (finest 1/4 resolution, like the original)."""

    width: int = 32

    @nn.compact
    def __call__(self, x):
        w = self.width
        act = lambda y: nn.leaky_relu(y, 0.1)
        conv = functools.partial(nn.Conv, use_bias=True)

        c1 = act(conv(w, (7, 7), (2, 2))(x))            # 1/2
        c2 = act(conv(2 * w, (5, 5), (2, 2))(c1))        # 1/4
        c3 = act(conv(4 * w, (5, 5), (2, 2))(c2))        # 1/8
        c3b = act(conv(4 * w, (3, 3))(c3))
        c4 = act(conv(8 * w, (3, 3), (2, 2))(c3b))       # 1/16
        c4b = act(conv(8 * w, (3, 3))(c4))
        c5 = act(conv(8 * w, (3, 3), (2, 2))(c4b))       # 1/32
        c5b = act(conv(8 * w, (3, 3))(c5))
        c6 = act(conv(16 * w, (3, 3), (2, 2))(c5b))      # 1/64
        c6b = act(conv(16 * w, (3, 3))(c6))

        deconv = functools.partial(nn.ConvTranspose, use_bias=True)
        predict = lambda f: nn.Conv(2, (3, 3), name=None)(f)

        def up(f):
            return deconv(f.shape[-1] // 2, (4, 4), (2, 2))(f)

        flow6 = predict(c6b)
        u5 = act(up(c6b))
        f5in = jnp.concatenate([u5, c5b, _upflow(flow6)], -1)
        flow5 = predict(f5in)
        u4 = act(up(f5in))
        f4in = jnp.concatenate([u4, c4b, _upflow(flow5)], -1)
        flow4 = predict(f4in)
        u3 = act(up(f4in))
        f3in = jnp.concatenate([u3, c3b, _upflow(flow4)], -1)
        flow3 = predict(f3in)
        u2 = act(up(f3in))
        f2in = jnp.concatenate([u2, c2, _upflow(flow3)], -1)
        flow2 = predict(f2in)
        return (flow2, flow3, flow4, flow5, flow6)


def _upflow(f):
    b, h, w, c = f.shape
    return 2.0 * jax.image.resize(f, (b, 2 * h, 2 * w, c), "bilinear")


def _downsample_flow(flow, factor):
    b, h, w, c = flow.shape
    return jax.image.resize(flow, (b, h // factor, w // factor, c), "bilinear")


def multiscale_epe(preds: Sequence[jax.Array], flow_gt: jax.Array):
    """FlowNet multi-scale endpoint-error objective (coarse scales weighted
    lower)."""
    weights = (0.005, 0.01, 0.02, 0.08, 0.32)
    total = 0.0
    for pred, wgt in zip(preds, reversed(weights)):
        factor = flow_gt.shape[1] // pred.shape[1]
        gt = _downsample_flow(flow_gt, factor)
        epe = jnp.sqrt(jnp.sum((pred - gt) ** 2, -1) + 1e-8)
        total = total + wgt * jnp.mean(epe)
    return total


def preprocess(batch):
    """Concatenate the image pair and normalize to roughly [-1, 1]."""
    x = jnp.concatenate([batch["image0"], batch["image1"]], axis=-1)
    return x / 127.5 - 1.0


def create_model(width: int = 32) -> FlowNetS:
    return FlowNetS(width=width)


def init_params(model: FlowNetS, rng, height: int, width: int):
    dummy = jnp.zeros((1, height, width, 6), jnp.float32)
    return model.init(rng, dummy)["params"]


def make_optimizer(lr: float = 1e-4):
    return optax.adam(lr)


def loss_fn(model, params, batch):
    preds = model.apply({"params": params}, preprocess(batch))
    return multiscale_epe(preds, batch["flow0"])


def make_train_step(model: FlowNetS, tx):
    """Jit-able (params, opt_state, batch) -> (params, opt_state, loss)."""

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(model, p, batch)
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def param_shardings(params, mesh, model_axis: str = "model"):
    """Megatron-style column parallelism: conv kernels shard output channels
    over the model axis, biases likewise; everything else replicated."""

    n = mesh.shape[model_axis]

    def spec(path, x):
        if x.ndim == 4 and x.shape[3] % n == 0:  # (kh, kw, cin, cout)
            return NamedSharding(mesh, P(None, None, None, model_axis))
        if x.ndim == 1 and x.shape[0] % n == 0:
            return NamedSharding(mesh, P(model_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def make_generate_and_train_step(cfg, model, tx, mesh=None):
    """The FULL pipeline step: on-device data generation fused with one
    training update — nothing ever touches the host. Returns a jit-able
    ``(root, step, atlas, params, opt_state) -> (params, opt_state, loss)``."""
    from ..pipeline.generator import generate_batch

    train_step = make_train_step(model, tx)

    def fused(root, step, atlas, params, opt_state):
        batch = generate_batch(root, step, atlas, cfg)
        return train_step(params, opt_state, batch)

    return fused
