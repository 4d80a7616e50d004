"""Mesh-sharded matching solves on a virtual 8-device CPU mesh.

The reference could only exercise its distributed path on real GPUs under
torchrun (reference ``tests/distributed/test_matching_distributed.py:116-119``
— skipped in CI).  Here the same golden trace is asserted for 1/2/4/8-way
entity sharding on the host-platform virtual device mesh, so shard-count
invariance runs in CI (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualip_tpu.objectives.matching import (
    MatchingInputArgs,
    MatchingSolverDualObjectiveFunction,
    MatchingSolverDualObjectiveFunctionDistributed,
)
from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
from dualip_tpu.parallel import default_mesh, entity_sharding
from dualip_tpu.projections import create_projection_map
from dualip_tpu.sparse import csc_from_dense

from tests.objectives.test_dualip_matching_simplex import A_COMPACT, TRUE_VALUES, set_up_data_scala


def _solve(mesh):
    gamma = 1e-3
    A, C, b_vec = set_up_data_scala()
    pm = create_projection_map("simplex", {"z": 1}, A.shape[1])
    obj = MatchingSolverDualObjectiveFunction(
        MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=b_vec), gamma=gamma, mesh=mesh
    )
    solver = AcceleratedGradientDescent(max_iter=30, gamma=gamma)
    return solver.maximize(obj, jnp.asarray(0.1 * np.ones(5, np.float32))), obj


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_sharded_golden_trace(n_devices):
    if len(jax.devices()) < n_devices:
        pytest.skip(f"needs {n_devices} devices")
    mesh = default_mesh(n_devices)
    res, obj = _solve(mesh)
    for i, true_val in TRUE_VALUES:
        got = res.dual_objective_log[i - 1]
        assert abs(got - true_val) < 1e-5, f"{n_devices} devices, iter {i}: {got} vs {true_val}"

    # tiles really are sharded over the entity axis
    some_tile = obj.bcsc.tiles[0]
    shardings = some_tile.a.sharding
    assert shardings.is_equivalent_to(entity_sharding(mesh), some_tile.a.ndim)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_butterfly_golden_trace(n_devices):
    """The butterfly fast path composes with the mesh: per-shard Benes plans
    stacked on a sharded leading axis, one psum per iteration."""
    if len(jax.devices()) < n_devices:
        pytest.skip(f"needs {n_devices} devices")
    gamma = 1e-3
    A, C, b_vec = set_up_data_scala()
    pm = create_projection_map("simplex", {"z": 1}, A.shape[1])
    obj = MatchingSolverDualObjectiveFunction(
        MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=b_vec),
        gamma=gamma,
        mesh=default_mesh(n_devices),
        layout="butterfly",
        pallas_block_k=128,
    )
    res = AcceleratedGradientDescent(max_iter=30, gamma=gamma).maximize(
        obj, jnp.asarray(0.1 * np.ones(5, np.float32))
    )
    for i, true_val in TRUE_VALUES:
        got = res.dual_objective_log[i - 1]
        assert abs(got - true_val) < 1e-5, f"{n_devices} devices, iter {i}: {got} vs {true_val}"
    # gradient replicated after the psum
    assert res.objective_result.dual_gradient.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(default_mesh(n_devices), jax.sharding.PartitionSpec()), 1
    )


def test_distributed_wrapper_matches_reference_api():
    """MatchingSolverDualObjectiveFunctionDistributed accepts the reference's
    constructor shape (local args + b_vec + gamma + host_device) and produces
    the golden trace (reference ``matching.py:218-245``)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    gamma = 1e-3
    A, C, b_vec = set_up_data_scala()
    pm = create_projection_map("simplex", {"z": 1}, A.shape[1])
    local_args = MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=None)
    obj = MatchingSolverDualObjectiveFunctionDistributed(
        local_args, b_vec=b_vec, gamma=gamma, host_device=None, mesh=default_mesh(2)
    )
    solver = AcceleratedGradientDescent(max_iter=30, gamma=gamma)
    res = solver.maximize(obj, jnp.asarray(0.1 * np.ones(5, np.float32)))
    for i, true_val in TRUE_VALUES:
        assert abs(res.dual_objective_log[i - 1] - true_val) < 1e-5


def test_shard_worker_partial_objective():
    """b_vec=None computes only shard-local parts (reference matching.py:56)."""
    A, C, b_vec = set_up_data_scala()
    pm = create_projection_map("simplex", {"z": 1}, A.shape[1])
    obj = MatchingSolverDualObjectiveFunction(
        MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=None), gamma=1e-3
    )
    assert obj.is_distributed
    res = obj.calculate(jnp.zeros(5, jnp.float32))
    assert res.max_pos_slack is None  # not finalized
    full = MatchingSolverDualObjectiveFunction(
        MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=b_vec), gamma=1e-3
    ).calculate(jnp.zeros(5, jnp.float32))
    # finalization: grad_full = grad_partial - b
    assert np.allclose(
        np.asarray(res.dual_gradient) - b_vec, np.asarray(full.dual_gradient), atol=1e-6
    )


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_compact_golden_trace(n_devices):
    """The flagship compact packing composes with the mesh (VERDICT r3 #4):
    per-shard compact layouts under forced common (L, L2, q, BP) geometry
    produce the same Scala golden trace as every other path."""
    if len(jax.devices()) < n_devices:
        pytest.skip(f"needs {n_devices} devices")
    gamma = 1e-3
    A, C, b_vec = set_up_data_scala()
    pm = create_projection_map("simplex", {"z": 1}, A.shape[1])
    obj = MatchingSolverDualObjectiveFunction(
        MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=b_vec),
        gamma=gamma,
        mesh=default_mesh(n_devices),
        layout="butterfly",
        pallas_block_k=128,
        compact=True,
    )
    assert obj.row_layout.col_pack is not None  # really the compact packing
    res = AcceleratedGradientDescent(max_iter=30, gamma=gamma).maximize(
        obj, jnp.asarray(0.1 * np.ones(5, np.float32))
    )
    for i, true_val in TRUE_VALUES:
        got = res.dual_objective_log[i - 1]
        assert abs(got - true_val) < 1e-5, f"{n_devices} devices, iter {i}: {got} vs {true_val}"


@pytest.mark.parametrize("compact", [False, True], ids=["plain", "compact"])
def test_sharded_tile_cache_warm_start(tmp_path, compact):
    """A mesh-sharded solve warm-starts from the device-ready tile cache
    (VERDICT r3 #4): the second build is a cache hit (no tile fill / routing)
    and reproduces the first solve's trace exactly."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    gamma = 1e-3
    A, C, b_vec = set_up_data_scala()
    pm = create_projection_map("simplex", {"z": 1}, A.shape[1])

    def build():
        return MatchingSolverDualObjectiveFunction(
            MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=b_vec),
            gamma=gamma,
            mesh=default_mesh(4),
            layout="butterfly",
            pallas_block_k=128,
            compact=compact,
            keep_flat_idx=False,
            keep_col_tiles=False,
            plan_cache_dir=str(tmp_path / "plans"),
            tile_cache_dir=str(tmp_path / "tiles"),
        )

    obj_cold = build()
    assert not any((tmp_path / "tiles").glob("*.tmp"))  # publish completed
    saved = list((tmp_path / "tiles").glob("butterfly_*"))
    assert len(saved) == 1, saved

    obj_warm = build()  # cache hit: same key, loads the stacked layout
    # the warm layout must have come from disk (same shapes, stacked leaves)
    lam0 = jnp.asarray(0.1 * np.ones(5, np.float32))
    res_cold = AcceleratedGradientDescent(max_iter=30, gamma=gamma).maximize(obj_cold, lam0)
    res_warm = AcceleratedGradientDescent(max_iter=30, gamma=gamma).maximize(obj_warm, lam0)
    np.testing.assert_array_equal(
        np.asarray(res_cold.dual_objective_log), np.asarray(res_warm.dual_objective_log)
    )
    for i, true_val in TRUE_VALUES:
        assert abs(res_warm.dual_objective_log[i - 1] - true_val) < 1e-5
