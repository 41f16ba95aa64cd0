"""Observability: throughput counters and device profiling.

The reference has no tracing or metrics at all (SURVEY.md §5: stdout prints
only). This provides the TPU-native equivalents: a samples/sec meter with
honest device synchronization, and a thin wrapper over ``jax.profiler`` for
XLA-level traces."""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List

import jax
import jax.numpy as jnp


def enable_compile_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache the way that actually
    works here: ``jax.config.update``. The usual env-var route
    (``JAX_COMPILATION_CACHE_DIR``) is DEAD in this environment — the axon
    sitecustomize imports jax at interpreter start, before any entry-point
    code can set the variable, so the config option is frozen at None and
    every process pays full cold compiles (multi-minute per program through
    the tunneled backend). Call this from every entry point before the
    first jit dispatch. Idempotent; safe after backend init."""
    import os

    jax.config.update(
        "jax_compilation_cache_dir",
        path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/root/.jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    # Executables whose compile the backend reports as instantaneous (the
    # tunneled client can't see server-side compile time) still cache.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def force_sync(tree) -> float:
    """Force completion of a computation by reading one scalar back to host.

    Under tunneled PJRT backends ``block_until_ready`` can return before the
    device finishes; a scalar readback cannot."""
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.ravel(leaf)[0])


@dataclass
class ThroughputMeter:
    """Rolling samples/sec meter. Feed it batch sizes as batches complete."""

    window: int = 32
    _times: List[float] = field(default_factory=list)
    _counts: List[int] = field(default_factory=list)
    total_samples: int = 0

    def tick(self, n_samples: int) -> None:
        self._times.append(time.perf_counter())
        self._counts.append(n_samples)
        self.total_samples += n_samples
        if len(self._times) > self.window:
            self._times.pop(0)
            self._counts.pop(0)

    @property
    def samples_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return sum(self._counts[1:]) / max(dt, 1e-9)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/flowgen-trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, iters: int = 5, warmup: int = 1):
    """Time a jitted callable with forced synchronization; returns best
    seconds/iter."""
    for _ in range(warmup):
        force_sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        force_sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best
