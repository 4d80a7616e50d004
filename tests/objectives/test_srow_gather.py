"""Gather-srow fast path (``srow_gather=True``): the forward Beneš carry's
action on the row-id broadcast is precomputed once at setup
(``RowLayout.srow_colidx``), so each iteration replaces the 3-HBM-pass
forward carry + pre-side mask read with one small-table gather.

The network does no arithmetic on its payload (every Beneš stage is a pure
masked exchange — ``dualip_tpu/ops/butterfly.py``), so the gather path must
be BIT-IDENTICAL to the routed path, not merely close: these tests assert
exact equality, plus the reference 5×5 golden trace (reference
``tests/objectives/test_dualip_matching_simplex.py``) solved end-to-end with
the flag on.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dualip_tpu.objectives.matching import (
    MatchingInputArgs,
    MatchingSolverDualObjectiveFunction,
)
from dualip_tpu.projections import create_projection_map
from dualip_tpu.sparse import csc_from_dense


def _problem(num_sources=96, num_destinations=16, seed=0):
    rng = np.random.default_rng(seed)
    dense = rng.uniform(0.1, 1.0, size=(num_destinations, num_sources)).astype(np.float32)
    dense[rng.random(dense.shape) < 0.6] = 0.0
    dense[0, :] = np.where(dense[0, :] == 0, 0.3, dense[0, :])
    return MatchingInputArgs(
        A=csc_from_dense(dense),
        c=csc_from_dense(np.where(dense != 0, -dense, 0.0).astype(np.float32)),
        projection_map=create_projection_map("simplex", {"z": 1.0}, num_sources),
        b_vec=np.full(num_destinations, 0.7, dtype=np.float32),
        equality_mask=None,
    )


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"compact": True},
        {"carry_dtype": jnp.bfloat16},
        {"compact": True, "carry_dtype": jnp.bfloat16},
    ],
    ids=["plain", "compact", "bf16", "compact-bf16"],
)
def test_gather_srow_bit_identical(kw):
    args = _problem()
    base = MatchingSolverDualObjectiveFunction(args, gamma=1e-3, layout="butterfly", **kw)
    fast = MatchingSolverDualObjectiveFunction(
        args, gamma=1e-3, layout="butterfly", srow_gather=True, **kw
    )
    assert fast.row_layout.srow_colidx is not None
    dv = jnp.asarray(np.random.default_rng(1).uniform(size=16).astype(np.float32))
    r0 = base.calculate_traceable(base.params, dv, 1e-3)
    r1 = fast.calculate_traceable(fast.params, dv, 1e-3)
    assert np.array_equal(np.asarray(r0.dual_gradient), np.asarray(r1.dual_gradient))
    assert float(r0.dual_objective) == float(r1.dual_objective)
    assert float(r0.reg_penalty) == float(r1.reg_penalty)


def test_gather_srow_row_multiplicity():
    """Index contract: every carry-buffer slot holds a valid row id or the
    sentinel m, and each constraint row appears exactly nnz(row) times."""
    args = _problem(64, 8, seed=3)
    obj = MatchingSolverDualObjectiveFunction(
        args, gamma=1e-3, layout="butterfly", srow_gather=True
    )
    idx = np.asarray(obj.row_layout.srow_colidx)
    m = obj.bcsc.m
    assert idx.min() >= 0 and idx.max() <= m
    counts = np.bincount(idx[idx < m], minlength=m)
    dense = np.zeros((m, 64), np.float32)
    A = args.A
    # rebuild dense nnz pattern from the CSC input
    for j in range(A.shape[1]):
        for p in range(int(A.indptr[j]), int(A.indptr[j + 1])):
            dense[int(A.row_indices[p]), j] = 1.0
    np.testing.assert_array_equal(counts, dense.sum(axis=1).astype(counts.dtype))


def test_gather_srow_golden_trace():
    """Reference 5×5 golden trace (same pinned values as
    tests/objectives/test_dualip_matching_simplex.py) through the gather-srow
    butterfly path at 1e-5."""
    from dualip_tpu.optimizers.agd import AcceleratedGradientDescent

    a = np.array(
        [
            [0.307766110869125, 0.483770735096186, 0.624996477039531, 0.669021712383255, 0.535811153938994],
            [0.257672501029447, 0.812402617651969, 0.882165518123657, 0.204612161964178, 0.710803845431656],
            [0.552322433330119, 0.370320537127554, 0.28035383997485, 0.357524853432551, 0.538348698290065],
            [0.0563831503968686, 0.546558595029637, 0.398487901547924, 0.359475114848465, 0.74897222686559],
            [0.468549283919856, 0.170262051047757, 0.76255108229816, 0.690290528349578, 0.420101450523362],
        ],
        dtype=np.float32,
    )
    golden_args = MatchingInputArgs(
        A=csc_from_dense(a.T),
        c=csc_from_dense(-a.T),
        projection_map=create_projection_map("simplex", {"z": 1}, 5),
        b_vec=np.full(5, 0.7, dtype=np.float32),
    )
    obj = MatchingSolverDualObjectiveFunction(
        golden_args, gamma=1e-3, layout="butterfly", srow_gather=True, compact=True
    )
    res = AcceleratedGradientDescent(max_iter=30, gamma=1e-3).maximize(
        obj, jnp.asarray(0.1 * np.ones(5, np.float32))
    )
    for i, true_val in [
        (2, -3.6010155991401818),
        (16, -3.60842718733725),
        (23, -3.5080258013053136),
        (29, -3.4868496294227143),
    ]:
        assert abs(float(res.dual_objective_log[i - 1]) - true_val) < 1e-5


def test_gather_srow_validation():
    args = _problem()
    with pytest.raises(ValueError, match="butterfly"):
        MatchingSolverDualObjectiveFunction(args, gamma=1e-3, layout="csc", srow_gather=True)
