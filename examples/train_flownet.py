#!/usr/bin/env python
"""Train a FlowNetS-style model on on-the-fly generated data.

This is BASELINE.md milestone config 5 — the full production shape: generation
and the training update run as one fused device step, so no sample ever
touches the host. The reference achieved the equivalent with Caffe
(example-prototxt/train.prototxt feeding a FlowNet; README.md:5).

Usage:
    python examples/train_flownet.py --mode 7 --batch 8 --steps 100
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import flowgen
from flowgen.random.streams import root_key
from flowgen.train import flownet
from flowgen.utils.profiling import ThroughputMeter, force_sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", type=int, default=7)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--model-width", type=int, default=24)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--texture-db", default=None, action="append")
    args = ap.parse_args()

    cfg = flowgen.DataGenConfig(
        mode=args.mode,
        batch_size=args.batch,
        width=args.width,
        height=args.height,
        seed=args.seed,
        texture_dbases=tuple(args.texture_db) if args.texture_db else (),
    )
    atlas = jnp.asarray(flowgen.atlas_for_config(cfg))

    model = flownet.create_model(width=args.model_width)
    params = flownet.init_params(model, jax.random.key(args.seed), cfg.height, cfg.width)
    tx = flownet.make_optimizer(args.lr)
    opt_state = tx.init(params)
    fused = jax.jit(flownet.make_generate_and_train_step(cfg, model, tx))

    root = root_key(cfg.seed)
    meter = ThroughputMeter()
    print("compiling...")
    for step in range(args.steps):
        params, opt_state, loss = fused(
            root, jnp.int32(step), atlas, params, opt_state
        )
        if step % 10 == 0 or step == args.steps - 1:
            lv = force_sync(loss)
            meter.tick(10 * cfg.batch_size if step else cfg.batch_size)
            print(
                f"step {step:5d}  loss {lv:8.4f}  "
                f"{meter.samples_per_sec:7.1f} samples/s"
            )
    print("done")


if __name__ == "__main__":
    main()
