#!/usr/bin/env python
"""Scan-based device-time measurement (no per-call dispatch floor).

`tools/profile_scene.py` pipelines N async dispatches, but each dispatch
still costs ~2.3 ms of host->device tunnel time, which floors every
sub-millisecond stage at the same reading. This tool instead runs K
iterations of a stage inside ONE jitted `lax.scan` (each iteration keyed by
a distinct step so XLA cannot elide work; outputs are reduced to a scalar
carried through the scan), paying the tunnel exactly once.

Usage: python tools/devtime.py [section ...]
  sections: sample flatten full prep  (default: sample flatten)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
# The env var alone is DEAD here (axon sitecustomize imports jax first);
# flowgen.utils.profiling.enable_compile_cache() below does the real work.
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from flowgen.utils.profiling import enable_compile_cache

enable_compile_cache()

BATCH = 32
ITERS = 16


def leaf_sum(tree):
    tot = jnp.float32(0.0)
    for leaf in jax.tree.leaves(tree):
        tot = tot + jnp.sum(leaf.astype(jnp.float32))
    return tot


def scan_time(fn, *args, iters=ITERS, label=""):
    """Device seconds per iteration of ``fn(step, *args) -> tree``."""

    @jax.jit
    def run(args):
        def body(acc, step):
            return acc + leaf_sum(fn(step, *args)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(iters, dtype=jnp.int32))
        return acc

    float(run(args))  # warmup/compile
    t0 = time.perf_counter()
    float(run(args))
    dt = (time.perf_counter() - t0 - 0.045) / iters  # subtract one tunnel RT
    print(f"{label:46s} {dt * 1e3:9.3f} ms/batch "
          f"({BATCH / dt:8.1f} samples/s)", flush=True)
    return dt


def main():
    sections = set(sys.argv[1:]) or {"sample", "flatten"}

    import flowgen
    from flowgen import DataGenConfig
    from flowgen.params.sampler import sample_scene_batch
    from flowgen.random.streams import root_key

    cfg = DataGenConfig(mode=7, batch_size=BATCH, seed=0)
    root = root_key(0)
    indices = jnp.arange(BATCH)

    if "sample" in sections:
        scan_time(
            lambda step: sample_scene_batch(root, step * BATCH + indices, cfg),
            label="sample_scene_batch",
        )

    if "flatten" in sections:
        # flatten_outline in isolation, at the real batch size:
        # B*(K + K*C) primitives.
        from flowgen.config import MAX_COMPONENTS, MAX_OBJECTS, MAX_SPOKES
        from flowgen.params import sampler as S

        n_prims = BATCH * (MAX_OBJECTS + MAX_OBJECTS * MAX_COMPONENTS)
        key = jax.random.PRNGKey(0)
        verts = jax.random.normal(key, (n_prims, MAX_SPOKES, 2), jnp.float32)
        types = jax.random.randint(key, (n_prims, MAX_SPOKES), 0, 3)
        ns = jax.random.randint(key, (n_prims,), 3, MAX_SPOKES)

        def flat_all(step, verts, types, ns):
            return jax.vmap(S.flatten_outline)(verts + step * 0.0, types, ns)

        scan_time(flat_all, verts, types, ns,
                  label=f"flatten_outline x{n_prims}")

    if "prep" in sections:
        from flowgen.compose import fused as fused_mod
        from flowgen.compose import render as render_mod

        scenes = jax.block_until_ready(
            jax.jit(lambda: sample_scene_batch(root, indices, cfg))()
        )

        def obj_prep(step, scenes):
            return jax.vmap(
                lambda s: fused_mod.prepare_scene_inputs(s, cfg, 32)
            )(scenes)

        def bg_flow(step, scenes):
            return jax.vmap(lambda s: render_mod.background_flow(s, cfg))(scenes)

        scan_time(obj_prep, scenes, label="prepare_scene_inputs")
        scan_time(bg_flow, scenes, label="background_flow")

    if "full" in sections:
        # The whole generate step scanned K times produces an HLO payload
        # that exceeds the axon remote-compile upload limit (HTTP 413);
        # measure the full step with tools/profile_scene.py (pipelined
        # dispatch) instead.
        print("full: use tools/profile_scene.py (scanned HLO exceeds the "
              "remote-compile upload limit)")


if __name__ == "__main__":
    main()
