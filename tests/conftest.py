"""Test harness config: force CPU with 8 virtual devices so the multi-chip
sharded path is exercised in CI without TPU hardware — something the reference
could not do (its distributed tests are skipped without CUDA+torchrun,
reference ``tests/distributed/test_matching_distributed.py:116-119``)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
