"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without a pod via
xla_force_host_platform_device_count, per the framework's test strategy
(SURVEY.md §4: the reference has no test framework at all; we add real unit
tests plus CPU-simulated multi-device tests).

The environment force-registers the axon TPU backend via sitecustomize
(JAX_PLATFORMS=axon) before conftest runs, so setting env vars is not
enough — we also override the jax config directly before any backend
initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
