"""Throughput benchmark: 512x384 image-pair+flow samples/sec on one chip.

Runs the reference's example configuration (mode 7, example-prototxt/
train.prototxt) end-to-end on-device and reports steady-state generation
throughput. The reference publishes no numbers (BASELINE.md); the baseline
used for ``vs_baseline`` is the BASELINE.json north-star rate of 10,000
samples/sec on a v5e-8, i.e. 1,250 samples/sec/chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N}
"""

import json
import sys
import time

BASELINE_PER_CHIP = 1250.0  # north star: 10k/s on v5e-8 (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp

    import flowgen
    from flowgen.random.streams import root_key

    mode = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    cfg = flowgen.DataGenConfig(mode=mode, batch_size=batch, seed=0)
    atlas = jnp.asarray(
        flowgen.procedural_atlas(32, height=cfg.height, width=cfg.width),
        jnp.float32,
    )
    fn = flowgen.make_generate_fn(cfg)
    # Force a device->host scalar readback per step: block_until_ready does
    # not reliably block under tunneled PJRT backends, and async dispatch
    # otherwise makes the measurement meaningless.
    probe = jax.jit(lambda o: o["flow0"].ravel()[-1] + o["image1"].ravel()[-1])
    root = root_key(0)

    # Warmup / compile.
    float(probe(fn(root, jnp.int32(0), atlas)))

    n_steps = 4
    t0 = time.perf_counter()
    for i in range(n_steps):
        float(probe(fn(root, jnp.int32(1 + i), atlas)))
    dt = time.perf_counter() - t0

    samples_per_sec = n_steps * batch / dt
    print(
        json.dumps(
            {
                "metric": f"512x384 image-pair+flow generation (mode {mode})",
                "value": round(samples_per_sec, 2),
                "unit": "samples/sec/chip",
                "vs_baseline": round(samples_per_sec / BASELINE_PER_CHIP, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
