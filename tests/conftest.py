"""Test harness config: run on the CPU backend with 8 virtual devices so
sharding logic is exercised without TPU hardware (SURVEY.md §4d)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
