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
