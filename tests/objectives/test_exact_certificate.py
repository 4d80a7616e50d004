"""Exact matching certificate (VERDICT r4 #2): closed-form unregularized
dual bound g0 + coupling-row primal repair.

Oracle: scipy.linprog (HiGHS) on the edge-level LP — variables are the nnz
entries, coupling rows carry A's values, one sum<=1 row per entity column.
The certificate must sandwich the true optimum from ANY dual iterate, and
the butterfly/compact layouts must agree with the csc formulation.
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent / "benchmark"))

from generate_synthetic_data import generate_synthetic_matching_input_args

from dualip_tpu.objectives.matching import MatchingSolverDualObjectiveFunction
from dualip_tpu.optimizers.agd import AcceleratedGradientDescent


@pytest.fixture(scope="module")
def problem():
    args = generate_synthetic_matching_input_args(300, 30, 0.08, seed=7)
    scipy_opt = pytest.importorskip("scipy.optimize")
    sparse = pytest.importorskip("scipy.sparse")
    nnz = args.A.nnz
    m, n = args.A.shape
    colid = np.repeat(np.arange(n), np.diff(args.A.indptr))
    Arow = sparse.csr_matrix((args.A.data, (args.A.row_indices, np.arange(nnz))), shape=(m, nnz))
    Acol = sparse.csr_matrix((np.ones(nnz), (colid, np.arange(nnz))), shape=(n, nnz))
    res = scipy_opt.linprog(
        args.c.data,
        A_ub=sparse.vstack([Arow, Acol]),
        b_ub=np.concatenate([args.b_vec, np.ones(n)]),
        bounds=(0, None),
        method="highs",
    )
    assert res.status == 0
    return args, float(res.fun)


def _solve(args, layout, gamma=1e-3, iters=300, **kw):
    obj = MatchingSolverDualObjectiveFunction(args, gamma=gamma, layout=layout, **kw)
    solver = AcceleratedGradientDescent(
        max_iter=iters, gamma=gamma, initial_step_size=1e-3, max_step_size=1e-1
    )
    res = solver.maximize(obj, jnp.zeros(args.A.shape[0], jnp.float32))
    return obj, res


def test_certificate_sandwiches_lp_optimum(problem):
    args, lp_opt = problem
    obj, res = _solve(args, "csc")
    cert = obj.exact_certificate(res.dual_val)
    assert cert["dual_lb"] <= lp_opt + 1e-4
    assert cert["primal_ub"] >= lp_opt - 1e-4
    assert cert["gap_abs"] >= 0
    assert cert["gap_rel"] < 0.1  # 300 iterations at gamma=1e-3 get close


def test_certificate_sandwich_holds_at_crude_duals(problem):
    """Weak duality must hold for ANY dual iterate, not just converged ones."""
    args, lp_opt = problem
    obj, _ = _solve(args, "csc", iters=2)
    for lam in (np.zeros(30), np.full(30, 5.0), np.linspace(0, 2, 30)):
        cert = obj.exact_certificate(jnp.asarray(lam, jnp.float32))
        assert cert["dual_lb"] <= lp_opt + 1e-4
        assert cert["primal_ub"] >= lp_opt - 1e-4


def test_certificate_layout_parity(problem):
    """csc / butterfly / compact evaluate the same certificate (same x̂ up to
    fp32 reassociation)."""
    args, _ = problem
    obj_c, res = _solve(args, "csc")
    ref = obj_c.exact_certificate(res.dual_val)
    for kw in ({}, {"compact": True}):
        obj_b = MatchingSolverDualObjectiveFunction(args, gamma=1e-3, layout="butterfly", **kw)
        cert = obj_b.exact_certificate(res.dual_val)
        for k in ("primal_ub", "dual_lb"):
            assert cert[k] == pytest.approx(ref[k], rel=2e-4), (kw, k)


def test_certificate_gap_shrinks_with_gamma_ladder(problem):
    """Warm-started gamma continuation tightens the certified gap (the
    artifact driver's mechanism, benchmark/run_certified_gap.py)."""
    args, _ = problem
    obj, res = _solve(args, "csc", gamma=1e-3, iters=400)
    gap0 = obj.exact_certificate(res.dual_val)["gap_rel"]
    obj2 = MatchingSolverDualObjectiveFunction(args, gamma=2.5e-4, layout="csc")
    solver = AcceleratedGradientDescent(
        max_iter=1200, gamma=2.5e-4, initial_step_size=1e-3, max_step_size=1e-1
    )
    res2 = solver.maximize(obj2, jnp.asarray(res.dual_val))
    gap1 = obj2.exact_certificate(res2.dual_val)["gap_rel"]
    assert gap1 < gap0


def test_certificate_rejects_unsupported_shapes(problem):
    args, _ = problem
    obj, _ = _solve(args, "csc", iters=2)
    from dataclasses import replace

    import dualip_tpu.objectives.matching as M

    dist_args = replace(args, b_vec=None)
    obj_local = M.MatchingSolverDualObjectiveFunction(dist_args, gamma=1e-3)
    with pytest.raises(ValueError, match="b_vec"):
        obj_local.exact_certificate(jnp.zeros(30, jnp.float32))
