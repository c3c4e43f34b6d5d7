"""Test harness configuration.

Tests run on CPU with 8 virtual devices (the standard JAX analog of testing
multi-host without a cluster — SURVEY.md section 4): deterministic, fast,
and exercises the same sharding code paths as a real pod slice.

NOTE: this environment's sitecustomize registers an `axon` remote-TPU
backend and forces jax_platforms="axon,cpu" via jax.config, which overrides
the JAX_PLATFORMS env var — so we must override through jax.config too,
BEFORE any backend initialization.  Eager ops on the tunneled TPU cost a
network round trip each; CPU keeps unit tests fast.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
