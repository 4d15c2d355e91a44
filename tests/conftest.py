"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (SURVEY §4 test strategy).

Note: this machine's sitecustomize pre-imports jax with JAX_PLATFORMS=axon
(a tunneled TPU). Env vars are therefore too late — we must override via
jax.config. XLA_FLAGS still works because backends initialize lazily.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
