"""Multi-host tile assembly exercised in single-process form (process_count=1
with an 8-device mesh): the make_array_from_process_local_data path must
produce sharded tiles equivalent to the direct device_put path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dualip_tpu.objectives.matching import MatchingInputArgs, MatchingSolverDualObjectiveFunction
from dualip_tpu.parallel import assemble_global_tiles, default_mesh, local_matching_shard
from dualip_tpu.projections import create_projection_map
from dualip_tpu.sparse import build_blockcsc, csc_from_dense

from tests.objectives.test_dualip_matching_simplex import TRUE_VALUES, set_up_data_scala


def test_assemble_global_tiles_single_process():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = default_mesh(8)

    A, C, b_vec = set_up_data_scala()
    pm = create_projection_map("simplex", {"z": 1}, A.shape[1])
    # "local" shard for this (only) process == the global problem
    local = local_matching_shard(
        MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=b_vec),
        process_index=0,
        process_count=1,
    )
    local_bcsc = build_blockcsc(local.A, local.c, local.projection_map, pad_cols_to=8)
    global_bcsc = assemble_global_tiles(local_bcsc, mesh)

    for t in global_bcsc.tiles:
        assert t.a.sharding.is_equivalent_to(
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("entities")), t.a.ndim
        )

    # solving with the assembled tiles reproduces the golden trace
    obj = MatchingSolverDualObjectiveFunction(
        MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=b_vec), gamma=1e-3, mesh=mesh
    )
    obj.bcsc = global_bcsc  # swap in the multihost-assembled tiles
    obj._jit_cache.clear()

    from dualip_tpu.optimizers.agd import AcceleratedGradientDescent

    res = AcceleratedGradientDescent(max_iter=30, gamma=1e-3).maximize(
        obj, jnp.asarray(0.1 * np.ones(5, np.float32))
    )
    for i, true_val in TRUE_VALUES:
        assert abs(res.dual_objective_log[i - 1] - true_val) < 1e-5


def test_assemble_global_tiles_metadata():
    # Regression: assembled tiles used to keep shard-local n/nnz/col_ids and
    # carry shard-local flat_idx in their specs.
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = default_mesh(8)
    A, C, b_vec = set_up_data_scala()
    pm = create_projection_map("simplex", {"z": 1}, A.shape[1])
    local = local_matching_shard(
        MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=b_vec),
        process_index=0,
        process_count=1,
    )
    local_bcsc = build_blockcsc(local.A, local.c, local.projection_map, pad_cols_to=8)
    g = assemble_global_tiles(
        local_bcsc, mesh, col_offset=7, global_n=A.shape[1] + 7, global_nnz=123
    )
    assert g.n == A.shape[1] + 7 and g.nnz == 123
    assert all(s.flat_idx is None for s in g.specs)
    for t in g.tiles:
        ids = np.asarray(t.col_ids)
        valid = ids >= 0
        assert valid.any() and (ids[valid] >= 7).all()  # offset applied
