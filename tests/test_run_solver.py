"""End-to-end ``run_solver`` tests (parity: reference ``run_solver.py`` API,
Appendix B of SURVEY.md) including warm start and the fixed Jacobi path."""

import numpy as np
import pytest

from dualip_tpu import ComputeArgs, ObjectiveArgs, SolverArgs, run_solver
from dualip_tpu.checkpoint import load_dual, save_dual
from dualip_tpu.objectives.matching import MatchingInputArgs
from dualip_tpu.objectives.miplib import MIPLIBInputArgs
from dualip_tpu.projections import create_projection_map
from dualip_tpu.sparse import csc_from_dense

from tests.objectives.test_dualip_matching_simplex import TRUE_VALUES, set_up_data_scala


def _matching_args():
    A, C, b_vec = set_up_data_scala()
    pm = create_projection_map("simplex", {"z": 1}, A.shape[1])
    return MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=b_vec, equality_mask=None)


def test_run_solver_matching():
    res = run_solver(
        input_args=_matching_args(),
        solver_args=SolverArgs(max_iter=30, gamma=1e-3),
        compute_args=ComputeArgs(host_device="cpu"),
        objective_args=ObjectiveArgs(objective_type="matching"),
    )
    assert len(res.dual_objective_log) == 30
    # starts from zeros (not the golden trace's 0.1 init) — check sanity only
    assert np.isfinite(res.dual_objective)


def test_run_solver_matching_multidevice():
    import jax

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs 2 devices")
    res = run_solver(
        input_args=_matching_args(),
        solver_args=SolverArgs(max_iter=10, gamma=1e-3),
        compute_args=ComputeArgs(host_device="cpu", compute_device_num=2),
        objective_args=ObjectiveArgs(objective_type="matching"),
    )
    single = run_solver(
        input_args=_matching_args(),
        solver_args=SolverArgs(max_iter=10, gamma=1e-3),
        compute_args=ComputeArgs(host_device="cpu", compute_device_num=1),
        objective_args=ObjectiveArgs(objective_type="matching"),
    )
    assert abs(res.dual_objective - single.dual_objective) < 1e-5


def test_run_solver_warm_start(tmp_path):
    """Warm start from a saved dual reproduces the golden-trace tail behavior
    (reference run_solver.py:127-132)."""
    path = str(tmp_path / "dual.npz")
    A, C, b_vec = set_up_data_scala()
    save_dual(path, 0.1 * np.ones(5, np.float32))
    loaded, state = load_dual(path)
    assert np.allclose(loaded, 0.1) and state is None

    res = run_solver(
        input_args=_matching_args(),
        solver_args=SolverArgs(max_iter=30, gamma=1e-3, initial_dual_path=path),
        compute_args=ComputeArgs(host_device="cpu"),
        objective_args=ObjectiveArgs(objective_type="matching"),
    )
    # with the warm start at 0.1 this IS the golden trace
    for i, true_val in TRUE_VALUES:
        assert abs(res.dual_objective_log[i - 1] - true_val) < 1e-5


def test_run_solver_miplib_with_jacobi():
    """The use_jacobi_precondition path through run_solver works end to end
    (it crashed in the reference, SURVEY.md §2.6.2)."""
    rng = np.random.default_rng(0)
    A = rng.normal(size=(3, 4)).astype(np.float32) * np.array([[1.0], [10.0], [100.0]], np.float32)
    c = rng.normal(size=4).astype(np.float32)
    b = np.abs(rng.normal(size=3)).astype(np.float32)
    pm = create_projection_map("box", {"l": 0.0, "u": 1.0}, 4)
    res = run_solver(
        input_args=MIPLIBInputArgs(A=A, c=c, projection_map=pm, b_vec=b, equality_mask=None),
        solver_args=SolverArgs(max_iter=50, gamma=1e-2),
        compute_args=ComputeArgs(host_device="cpu"),
        objective_args=ObjectiveArgs(objective_type="miplib2017", use_jacobi_precondition=True),
    )
    assert np.isfinite(res.dual_objective)
    assert res.dual_val.shape == (3,)


def test_save_primal_through_run_solver():
    res = run_solver(
        input_args=_matching_args(),
        solver_args=SolverArgs(max_iter=5, gamma=1e-3, save_primal=True),
        compute_args=ComputeArgs(host_device="cpu"),
        objective_args=ObjectiveArgs(objective_type="matching"),
    )
    assert res.objective_result.primal_var is not None


def test_run_solver_butterfly_layout_kwarg():
    """The butterfly fast path is reachable through the public API
    (``ObjectiveArgs.objective_kwargs``) and matches the default layout."""
    base = run_solver(
        input_args=_matching_args(),
        solver_args=SolverArgs(max_iter=20, gamma=1e-3),
        compute_args=ComputeArgs(host_device="cpu"),
        objective_args=ObjectiveArgs(objective_type="matching"),
    )
    bf = run_solver(
        input_args=_matching_args(),
        solver_args=SolverArgs(max_iter=20, gamma=1e-3),
        compute_args=ComputeArgs(host_device="cpu"),
        objective_args=ObjectiveArgs(
            objective_type="matching", objective_kwargs={"layout": "butterfly"}
        ),
    )
    np.testing.assert_allclose(bf.dual_objective, base.dual_objective, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(bf.dual_val), np.asarray(base.dual_val), atol=1e-6
    )


def test_register_objective_custom_type():
    """Extension: a user objective plugs into run_solver by name — the
    operator-centric story at the entry point (the reference hard-codes its
    two types, reference run_solver.py:44-71)."""
    import jax.numpy as jnp

    from dualip_tpu import ObjectiveArgs, register_objective, run_solver
    from dualip_tpu.types import ComputeArgs, ObjectiveResult, SolverArgs

    @register_objective("toy_quadratic")
    def _build_toy(input_args, solver_args, compute_args, mesh, scale=1.0):
        assert mesh is None  # single device below

        class Toy:
            equality_mask = None
            params = ()

            def calculate_traceable(self, params, dual_val, gamma):
                # g(x) = -scale * ||x - 3||^2  (maximized at x = 3)
                grad = -2.0 * scale * (dual_val - 3.0)
                obj = -scale * jnp.sum((dual_val - 3.0) ** 2)
                return ObjectiveResult(dual_gradient=grad, dual_objective=obj)

        return Toy()

    from dataclasses import make_dataclass

    InputArgs = make_dataclass("InputArgs", [("b_vec", object)])
    res = run_solver(
        input_args=InputArgs(b_vec=np.zeros(2, np.float32)),
        solver_args=SolverArgs(max_iter=400, gamma=None, initial_step_size=0.05,
                               max_step_size=0.5),
        compute_args=ComputeArgs(host_device="cpu", compute_device_num=1),
        objective_args=ObjectiveArgs(objective_type="toy_quadratic",
                                     objective_kwargs={"scale": 2.0}),
    )
    np.testing.assert_allclose(np.asarray(res.dual_val), [3.0, 3.0], atol=1e-3)

    with pytest.raises(ValueError, match="not supported"):
        run_solver(
            input_args=InputArgs(b_vec=np.zeros(2, np.float32)),
            solver_args=SolverArgs(max_iter=1, gamma=None),
            compute_args=ComputeArgs(host_device="cpu", compute_device_num=1),
            objective_args=ObjectiveArgs(objective_type="nope"),
        )
