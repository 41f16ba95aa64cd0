#!/usr/bin/env python
"""On-device Pallas-vs-XLA equivalence check (run on real TPU hardware).

The CPU test suite exercises the Pallas kernels in interpreter mode; this
script validates the compiled kernels on the actual chip by rendering
identical batches with use_pallas="always" and "never" and comparing:
flow must match exactly, images within AA-edge numerics.

Usage: python tools/check_pallas_tpu.py [mode ...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax.numpy as jnp

    import flowgen
    from flowgen.random.streams import root_key

    modes = [int(m) for m in sys.argv[1:]] or [1, 7, 9]
    failures = 0
    for mode in modes:
        outs = {}
        for up in ("never", "always"):
            cfg = flowgen.DataGenConfig(
                mode=mode, batch_size=4, seed=3, use_pallas=up
            )
            atlas = jnp.asarray(
                flowgen.procedural_atlas(4, height=cfg.height, width=cfg.width)
            )
            fn = flowgen.make_generate_fn(cfg)
            outs[up] = {
                k: np.asarray(v)
                for k, v in fn(root_key(3), jnp.int32(1), atlas).items()
            }
        dflow = np.abs(outs["never"]["flow0"] - outs["always"]["flow0"]).max()
        dimg = max(
            (np.abs(outs["never"][k] - outs["always"][k]) > 0.5).mean()
            for k in ("image0", "image1")
        )
        ok = dflow == 0.0 and dimg < 1e-3
        failures += 0 if ok else 1
        print(
            f"mode {mode}: flow maxdiff {dflow}, image frac>0.5 {dimg:.2e} "
            f"{'OK' if ok else 'FAIL'}"
        )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
