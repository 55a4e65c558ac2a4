"""Test harness config: run on the CPU backend with 8 virtual devices so
sharding logic is exercised without TPU hardware (SURVEY.md §4d).

NB: the environment's axon sitecustomize programmatically sets
jax_platforms="axon,cpu" at interpreter start (overriding the env var), so we
must override via jax.config.update *after* importing jax."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NB: jax_compilation_cache_dir hangs in this environment (axon plugin) — do
# not enable the persistent compile cache.
