"""Differential tests against the ACTUAL reference implementation.

The reference (linkedin/DuaLip v5.0.1) is pure Python/torch and runs on CPU,
so beyond the four pinned golden traces we can compare this rebuild against
the reference itself on RANDOMIZED problems: same inputs, iteration-for-
iteration dual-objective traces (full AGD dynamics — step-size engine,
Nesterov sequence, dual-cone projection, gamma decay), objective
gradients, PDLP certificates, and projection operators.

Nothing here imports reference code into the package — the reference is
loaded from its own checkout (``/root/reference`` or
``DUALIP_REFERENCE_PATH``) purely as a test oracle, exactly like
``benchmark/measure_torch_baseline.py``.  All tests skip when the checkout
is absent.

Reference call surfaces exercised: ``MatchingSolverDualObjectiveFunction``
(matching.py:37), ``MIPLIB2017ObjectiveFunction`` (miplib.py:28),
``AcceleratedGradientDescent.maximize`` (agd.py:66,121),
``calculate_convergence_bound`` (miplib.py:156-230), and the projection
registry (projections/base.py:40-57).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "benchmark"))
from reference_loader import (  # noqa: E402  (shared oracle loader)
    DEFAULT_REFERENCE_PATH as REF,
    load_reference,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(),
    reason="reference checkout not available (set DUALIP_REFERENCE_PATH)",
)


@pytest.fixture(scope="module")
def ref():
    pytest.importorskip("torch")
    return load_reference()


def _quiet(i, r):  # silence the reference's per-iteration print callback
    pass


def _random_matching(rng, m, n, density=0.35):
    """Random matching LP with binding budgets and no empty columns."""
    mask = rng.random((m, n)) < density
    for j in range(n):
        if not mask[:, j].any():
            mask[rng.integers(m), j] = True
    dense = np.where(mask, rng.uniform(0.2, 1.0, (m, n)), 0.0).astype(np.float32)
    cvals = np.where(mask, -rng.uniform(0.1, 1.0, (m, n)), 0.0).astype(np.float32)
    b = rng.uniform(0.3, 1.5, m).astype(np.float32)
    return dense, cvals, b


def _solve_ref_matching(ref, dense, cvals, b, gamma, max_iter, eq=None, **agd_kw):
    torch = ref.torch
    pm = ref.proj.create_projection_map("simplex", {"z": 1.0}, dense.shape[1])
    args = ref.matching.MatchingInputArgs(
        A=torch.from_numpy(dense).to_sparse_csc(),
        c=torch.from_numpy(cvals).to_sparse_csc(),
        projection_map=pm,
        b_vec=torch.from_numpy(b),
        equality_mask=torch.from_numpy(eq) if eq is not None else None,
    )
    obj = ref.matching.MatchingSolverDualObjectiveFunction(args, gamma=gamma)
    solver = ref.agd.AcceleratedGradientDescent(
        max_iter=max_iter,
        gamma=gamma,
        initial_step_size=1e-3,
        max_step_size=0.1,
        iteration_callback=_quiet,
        **agd_kw,
    )
    return solver.maximize(obj, torch.zeros(len(b)))


def _solve_ours_matching(dense, cvals, b, gamma, max_iter, eq=None, **agd_kw):
    import jax.numpy as jnp

    from dualip_tpu.objectives.matching import (
        MatchingInputArgs,
        MatchingSolverDualObjectiveFunction,
    )
    from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
    from dualip_tpu.projections import create_projection_map
    from dualip_tpu.sparse import csc_from_dense

    args = MatchingInputArgs(
        A=csc_from_dense(dense),
        c=csc_from_dense(cvals),
        projection_map=create_projection_map("simplex", {"z": 1.0}, dense.shape[1]),
        b_vec=b,
        equality_mask=eq,
    )
    obj = MatchingSolverDualObjectiveFunction(args, gamma=gamma)
    solver = AcceleratedGradientDescent(
        max_iter=max_iter,
        gamma=gamma,
        initial_step_size=1e-3,
        max_step_size=0.1,
        **agd_kw,
    )
    return solver.maximize(obj, jnp.zeros(len(b), jnp.float32))


@pytest.mark.parametrize("seed,m,n", [(0, 6, 40), (1, 12, 90), (2, 9, 64)])
def test_matching_trace_matches_reference(ref, seed, m, n):
    """Full 30-iteration dual-objective trace, iteration for iteration."""
    rng = np.random.default_rng(seed)
    dense, cvals, b = _random_matching(rng, m, n)
    res_ref = _solve_ref_matching(ref, dense, cvals, b, gamma=1e-2, max_iter=30)
    res = _solve_ours_matching(dense, cvals, b, gamma=1e-2, max_iter=30)
    np.testing.assert_allclose(
        np.asarray(res.dual_objective_log),
        np.asarray(res_ref.dual_objective_log, dtype=np.float64),
        rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(res.dual_val),
        res_ref.dual_val.numpy(),
        rtol=1e-3,
        atol=1e-4,
    )


def test_matching_trace_with_equality_rows(ref):
    """Equality rows leave the dual unprojected (free sign) — same dynamics."""
    rng = np.random.default_rng(7)
    dense, cvals, b = _random_matching(rng, 8, 50)
    eq = np.zeros(8, dtype=bool)
    eq[1] = eq[4] = True
    res_ref = _solve_ref_matching(ref, dense, cvals, b, gamma=1e-2, max_iter=30, eq=eq)
    res = _solve_ours_matching(dense, cvals, b, gamma=1e-2, max_iter=30, eq=eq)
    np.testing.assert_allclose(
        np.asarray(res.dual_objective_log),
        np.asarray(res_ref.dual_objective_log, dtype=np.float64),
        rtol=1e-4,
        atol=1e-4,
    )


def test_matching_trace_with_gamma_decay(ref):
    """gamma 'step' decay (and its max_step_size coupling, agd.py:102-109)."""
    rng = np.random.default_rng(11)
    dense, cvals, b = _random_matching(rng, 7, 45)
    kw = dict(
        gamma_decay_type="step",
        gamma_decay_params={"decay_steps": 7, "decay_factor": 0.5},
    )
    res_ref = _solve_ref_matching(ref, dense, cvals, b, gamma=5e-2, max_iter=30, **kw)
    res = _solve_ours_matching(dense, cvals, b, gamma=5e-2, max_iter=30, **kw)
    np.testing.assert_allclose(
        np.asarray(res.dual_objective_log),
        np.asarray(res_ref.dual_objective_log, dtype=np.float64),
        rtol=1e-4,
        atol=1e-4,
    )


def _random_lp(rng, m, n):
    A = rng.normal(size=(m, n)).astype(np.float32)
    c = rng.normal(size=n).astype(np.float32)
    b = rng.uniform(0.5, 2.0, m).astype(np.float32)
    return A, c, b


def _lp_projection_maps(ref, n):
    """Same split map in both schemas: box on even ids, cone on odd ids."""
    even = list(range(0, n, 2))
    odd = list(range(1, n, 2))
    ref_pm = {
        **ref.proj.create_projection_map(
            "box", {"lower": 0.0, "upper": 1.0}, n, indices=even
        ),
        **ref.proj.create_projection_map("cone", {"lower": 0.0}, n, indices=odd),
    }
    from dualip_tpu.projections import create_projection_map

    our_pm = {
        **create_projection_map("box", {"lower": 0.0, "upper": 1.0}, n, indices=even),
        **create_projection_map("cone", {"lower": 0.0}, n, indices=odd),
    }
    return ref_pm, our_pm


@pytest.mark.parametrize("seed", [3, 4])
def test_miplib_calculate_matches_reference(ref, seed):
    """General-LP dual gradient/objective/slacks at random duals (dense A)."""
    torch = ref.torch
    rng = np.random.default_rng(seed)
    m, n = 9, 24
    A, c, b = _random_lp(rng, m, n)
    eq = np.zeros(m, dtype=bool)
    eq[2] = True
    ref_pm, our_pm = _lp_projection_maps(ref, n)

    ref_obj = ref.miplib.MIPLIB2017ObjectiveFunction(
        ref.miplib.MIPLIBInputArgs(
            A=torch.from_numpy(A),
            c=torch.from_numpy(c),
            projection_map=ref_pm,
            b_vec=torch.from_numpy(b),
            equality_mask=torch.from_numpy(eq),
        )
    )
    from dualip_tpu.objectives.miplib import MIPLIB2017ObjectiveFunction, MIPLIBInputArgs

    our_obj = MIPLIB2017ObjectiveFunction(
        MIPLIBInputArgs(A=A, c=c, projection_map=our_pm, b_vec=b, equality_mask=eq)
    )

    for k in range(3):
        dual = rng.normal(size=m).astype(np.float32) * (k + 1)
        r_ref = ref_obj.calculate(torch.from_numpy(dual), gamma=1e-2)
        r = our_obj.calculate(dual, gamma=1e-2)
        # fp32 matmul accumulation order differs (torch mv vs XLA dot);
        # observed up to ~3e-5 relative on O(1e3) components.
        np.testing.assert_allclose(
            np.asarray(r.dual_gradient), r_ref.dual_gradient.numpy(), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            float(r.dual_objective), float(r_ref.dual_objective), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            float(r.reg_penalty), float(r_ref.reg_penalty), rtol=1e-4, atol=1e-4
        )
        # The reference miplib objective leaves the slack diagnostics None
        # (only the matching objective fills them, matching.py:167-169);
        # compare them only when the reference provides values.
        for name in ("max_pos_slack", "sum_pos_slack"):
            theirs = getattr(r_ref, name)
            if theirs is not None:
                np.testing.assert_allclose(
                    float(getattr(r, name)), float(theirs), rtol=1e-4, atol=1e-4
                )


def test_miplib_certificate_matches_reference(ref):
    """PDLP certificate (gap/feasibility) bit-parity at random duals."""
    torch = ref.torch
    rng = np.random.default_rng(5)
    m, n = 8, 20
    A, c, b = _random_lp(rng, m, n)
    eq = np.zeros(m, dtype=bool)
    eq[0] = True
    # All-box bounds: the reference's primal recovery x = where(r>=0, l, u)
    # (miplib.py:189-191) raises "Unbounded x." whenever a selected bound is
    # absent (NaN), so cone-bounded variables can't be certificate-tested.
    # Key schema: the reference's bound extraction reads "l"/"u"
    # (miplib.py:117-120) while its box OP takes "lower"/"upper" — the §2.6.4
    # schema split.  The certificate only uses the bounds, so the reference
    # map must use "l"/"u" here; ours accepts either schema (unified).
    even = list(range(0, n, 2))
    odd = list(range(1, n, 2))
    ref_pm = {
        **ref.proj.create_projection_map("box", {"l": 0.0, "u": 1.0}, n, indices=even),
        **ref.proj.create_projection_map("box", {"l": -1.0, "u": 2.0}, n, indices=odd),
    }
    from dualip_tpu.projections import create_projection_map

    our_pm = {
        **create_projection_map("box", {"l": 0.0, "u": 1.0}, n, indices=even),
        **create_projection_map("box", {"l": -1.0, "u": 2.0}, n, indices=odd),
    }

    ref_obj = ref.miplib.MIPLIB2017ObjectiveFunction(
        ref.miplib.MIPLIBInputArgs(
            A=torch.from_numpy(A),
            c=torch.from_numpy(c),
            projection_map=ref_pm,
            b_vec=torch.from_numpy(b),
            equality_mask=torch.from_numpy(eq),
        )
    )
    from dualip_tpu.objectives.miplib import MIPLIB2017ObjectiveFunction, MIPLIBInputArgs

    our_obj = MIPLIB2017ObjectiveFunction(
        MIPLIBInputArgs(A=A, c=c, projection_map=our_pm, b_vec=b, equality_mask=eq)
    )

    for k in range(3):
        dual = np.abs(rng.normal(size=m)).astype(np.float32) * (k + 0.5)
        # the reference applies torch.abs to optimal_primal_obj, so it must
        # already be a tensor (a plain float raises TypeError)
        out_ref = ref_obj.calculate_convergence_bound(
            torch.from_numpy(dual), optimal_primal_obj=torch.tensor(1.25), tol=1e-4
        )
        out = our_obj.calculate_convergence_bound(dual, optimal_primal_obj=1.25, tol=1e-4)
        for ours, theirs, name in zip(
            out[:4], out_ref[:4], ("gap_ub", "gap_lb", "primal_feas", "dual_feas")
        ):
            np.testing.assert_allclose(
                float(ours), float(theirs), rtol=1e-4, atol=1e-4, err_msg=name
            )
        assert bool(out[4]) == bool(out_ref[4])


@pytest.mark.parametrize("method", ["duchi", "bisection_search"])
@pytest.mark.parametrize("kind", ["simplex", "simplex_eq"])
def test_simplex_projection_matches_reference(ref, kind, method):
    """Both simplex algorithms on random column batches, both radii.

    Layout note: the reference projects the COLUMNS of an (L, B) matrix;
    ours projects along the LAST axis of (B, L) — compared transposed.

    Oracle note: the reference's methods DISAGREE with each other on
    inequality columns that contain negative entries but are feasible after
    clamping (e.g. x = [-1.87, -1.79, 0.72, -0.50, -2.25, -1.29], z = 1):
    its bisection feasibility exit requires all entries >= -tol
    (simplex.py:41), so such columns fall through to the vertex shortcut
    evaluated on UNCLAMPED values (simplex.py:53-80) and come back one-hot —
    while its Duchi path pre-clamps (simplex.py:148) and correctly returns
    the clamped vector (the true Euclidean projection: projecting a feasible
    point is the identity).  PARITY.md records this as discovered reference
    defect #7.  Both of our methods implement the correct pre-clamp
    semantics, so BOTH are compared against the reference's Duchi output.
    """
    torch = ref.torch
    rng = np.random.default_rng(13)
    from dualip_tpu.projections.base import project as our_project

    for z in (1.0, 2.5):
        v = rng.normal(size=(6, 50)).astype(np.float32) * 1.5
        out_ref = ref.proj.project(kind, z=z, method="duchi")(torch.from_numpy(v))
        out = our_project(kind, z=z, method=method)(np.ascontiguousarray(v.T))
        np.testing.assert_allclose(
            np.asarray(out).T, out_ref.numpy(), rtol=1e-5, atol=1e-5
        )


def test_box_cone_projection_matches_reference(ref):
    torch = ref.torch
    rng = np.random.default_rng(17)
    v = rng.normal(size=(5, 30)).astype(np.float32) * 2
    from dualip_tpu.projections.base import project as our_project

    cases = [
        ("box", {"lower": -0.5, "upper": 0.75}),
        ("box", {}),
        ("cone", {"lower": 0.0}),
        ("cone", {"upper": 1.0}),
    ]
    for kind, params in cases:
        out_ref = ref.proj.project(kind, **params)(torch.from_numpy(v))
        out = our_project(kind, **params)(v)
        np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("our_layout", ["coo", "butterfly"])
def test_miplib_sparse_calculate_matches_reference(ref, our_layout):
    """Sparse general-LP path: reference torch-COO vs our CSC segment ops
    (and the butterfly sparse-matvec engine) on the same random sparse A."""
    torch = ref.torch
    rng = np.random.default_rng(8)
    m, n = 12, 40
    mask = rng.random((m, n)) < 0.3
    mask[rng.integers(m), :] |= False
    A = np.where(mask, rng.normal(size=(m, n)), 0.0).astype(np.float32)
    c = rng.normal(size=n).astype(np.float32)
    b = rng.uniform(0.5, 2.0, m).astype(np.float32)
    ref_pm, our_pm = _lp_projection_maps(ref, n)

    ref_obj = ref.miplib.MIPLIB2017ObjectiveFunction(
        ref.miplib.MIPLIBInputArgs(
            A=torch.from_numpy(A).to_sparse_coo(),
            c=torch.from_numpy(c),
            projection_map=ref_pm,
            b_vec=torch.from_numpy(b),
            equality_mask=None,
        )
    )
    from dualip_tpu.objectives.miplib import MIPLIB2017ObjectiveFunction, MIPLIBInputArgs
    from dualip_tpu.sparse import csc_from_dense

    our_obj = MIPLIB2017ObjectiveFunction(
        MIPLIBInputArgs(
            A=csc_from_dense(A), c=c, projection_map=our_pm, b_vec=b, equality_mask=None
        ),
        layout=our_layout,
    )

    for k in range(3):
        dual = rng.normal(size=m).astype(np.float32) * (k + 1)
        r_ref = ref_obj.calculate(torch.from_numpy(dual), gamma=1e-2)
        r = our_obj.calculate(dual, gamma=1e-2)
        np.testing.assert_allclose(
            np.asarray(r.dual_gradient), r_ref.dual_gradient.numpy(), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            float(r.dual_objective), float(r_ref.dual_objective), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            float(r.reg_penalty), float(r_ref.reg_penalty), rtol=1e-4, atol=1e-4
        )


def test_mps_reader_matches_reference_on_bundled_instance(ref):
    """Parse the bundled MIPLIB instance with BOTH readers and compare the
    normalized LP piece by piece (c, b, equality mask, the full coefficient
    matrix, and variable bounds — ours NaN-codes absent sides where the
    reference emits ±inf)."""
    import importlib.util

    bundled = Path(__file__).resolve().parents[1] / "examples" / "miplib_2017" / "v150d30-2hopcds.mps.gz"
    if not bundled.exists():
        pytest.skip("bundled MIPLIB instance missing")

    spec = importlib.util.spec_from_file_location(
        "ref_read_mps", REF / "examples" / "miplib_2017" / "read_mps_data.py"
    )
    ref_mps = importlib.util.module_from_spec(spec)
    sys.path.insert(0, str(REF / "src"))
    try:
        spec.loader.exec_module(ref_mps)
    finally:
        sys.path.remove(str(REF / "src"))

    ref_lp = ref_mps.read_mps_file(str(bundled)).to_dualip_format(return_sparse=False)
    from dualip_tpu.io.mps import read_mps_file

    lp = read_mps_file(str(bundled))

    np.testing.assert_allclose(lp.c, ref_lp.C.numpy(), rtol=1e-6)
    np.testing.assert_allclose(lp.b, ref_lp.b_vec.numpy(), rtol=1e-6)
    if ref_lp.equality_mask is None:
        assert not lp.equality_mask.any()
    else:
        np.testing.assert_array_equal(lp.equality_mask, ref_lp.equality_mask.numpy())

    m, n = lp.shape
    A = np.zeros((m, n), dtype=np.float64)
    A[lp.a_rows, lp.a_cols] = lp.a_vals
    np.testing.assert_allclose(A, ref_lp.A.numpy(), rtol=1e-6, atol=1e-7)

    # bounds: reference var_bounds are (l, u) with ±inf; ours NaN-code them
    ref_l = np.array([b[0] for b in ref_lp.var_bounds], dtype=np.float64)
    ref_u = np.array([b[1] for b in ref_lp.var_bounds], dtype=np.float64)
    ours_l = np.where(np.isnan(lp.lower), -np.inf, lp.lower)
    ours_u = np.where(np.isnan(lp.upper), np.inf, lp.upper)
    np.testing.assert_allclose(ours_l, ref_l)
    np.testing.assert_allclose(ours_u, ref_u)
