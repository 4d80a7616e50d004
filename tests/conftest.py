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


# ---------------------------------------------------------------------------
# Fast/slow split: the multi-10s tail (canonical-layout parity solves, the
# bundled-MPS 10k-iteration assertion, subprocess benchmark smoke tests,
# two-process multihost) is marked `slow` here in one place so
# `pytest -m "not slow"` is a genuinely fast dev loop.  Measured times for
# both loops are documented in CLAUDE.md.
_SLOW_PATTERNS = (
    "test_compact_layout.py",            # canonical compact-packing parity solves
    "test_tile_cache.py::test_tile_cache_solve_matches_uncached",
    "test_tile_cache.py::test_tile_cache_roundtrip_identical",
    "test_rowmajor_layout.py::test_butterfly_bf16",
    "test_benchmark_scripts.py",         # subprocess end-to-end benchmark smokes
    "test_mps_reader.py::test_v150d30_butterfly_layout_agrees",
    "test_mps_reader.py::test_v150d30_dual_objective",  # 10k-iteration solve
    "test_multihost_two_process.py",     # spawns 2 jax.distributed processes
    "test_misc_components.py::test_graft_dryrun_multichip",
    "test_matching_sharded.py::test_sharded_compact_golden_trace",
    "test_matching_sharded.py::test_sharded_tile_cache_warm_start",
    "test_movielens_example.py::test_proxy_solve",
    "test_differential_reference.py",    # torch reference lockstep traces
)


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        if any(p in item.nodeid for p in _SLOW_PATTERNS):
            item.add_marker(_pytest.mark.slow)
