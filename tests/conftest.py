"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without a pod via
xla_force_host_platform_device_count, per the framework's test strategy
(SURVEY.md §4: the reference has no test framework at all; we add real unit
tests plus CPU-simulated multi-device tests).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")
