"""Test harness config: force CPU with 8 virtual devices so the multi-chip
sharded path is exercised in CI without TPU hardware — something the reference
could not do (its distributed tests are skipped without CUDA+torchrun,
reference ``tests/distributed/test_matching_distributed.py:116-119``).

Note: a sitecustomize in this image imports jax at interpreter startup, so
env-var routes (JAX_PLATFORMS / XLA_FLAGS) are already consumed; we use the
post-import config knobs instead (valid until first backend use)."""

import os

os.environ["JAX_PLATFORMS"] = os.environ.get("DUALIP_TEST_PLATFORM", "cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
if os.environ["JAX_PLATFORMS"] == "cpu":
    jax.config.update("jax_num_cpu_devices", 8)
