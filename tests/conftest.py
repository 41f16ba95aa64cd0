"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so the multi-chip sharding
paths can be exercised without TPU hardware (SURVEY.md §4). The axon TPU plugin
forces ``jax_platforms="axon,cpu"`` from sitecustomize at interpreter start, so
env vars alone are not enough — we must flip the config back after import,
before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

# Persistent compile cache (jax.config — env vars are frozen out by the
# axon sitecustomize's early jax import): XLA:CPU recompiles of the big
# fused/interpret programs dominate suite wall time on this 1-core box;
# warm runs skip them.
from flowgen.utils.profiling import enable_compile_cache  # noqa: E402

enable_compile_cache()


# Tests that run the interpret-mode scene megakernel, the mode-9 bank
# composition, or the scalar NumPy oracle at production frame size take
# minutes each on one CPU core; everything else is seconds. Marking the
# minutes-scale tail ``slow`` keeps the default iteration loop fast:
#   python -m pytest tests/ -m "not slow" -x -q     (~4 min fast core)
#   python -m pytest tests/ -x -q                   (full ~28 min suite)
# The slow tail holds CONTRACT tests (oracle parity, cross-path equality,
# bank content) — CI and pre-merge runs must include it.
_SLOW = {
    "test_oracle.py",        # scalar oracle + interpret megakernel, 13 modes
    "test_fused.py",         # interpret megakernel at production size
    "test_pallas_fields.py", # 1536^2 bank composition in interpret mode
    "test_masks.py",         # interpret megakernel with mask emission
    "test_disparity.py",     # interpret megakernel, disparity modes
    "test_train.py",         # FlowNetS fwd+bwd over generated batches
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.path.name in _SLOW:
            item.add_marker(pytest.mark.slow)
