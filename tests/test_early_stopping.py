"""Optional early stopping via stop_condition (extension over the reference's
fixed-iteration solver, wired to the PDLP certificate)."""

import numpy as np

import jax.numpy as jnp

from dualip_tpu.objectives.miplib import MIPLIB2017ObjectiveFunction, MIPLIBInputArgs
from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
from dualip_tpu.projections import create_projection_map


def _problem():
    c = np.array([-1.0, -1.0], dtype=np.float32)
    A = np.array([[4.0, 1.0], [1.0, 2.0]], dtype=np.float32)
    b = np.array([2.0, 1.0], dtype=np.float32)
    pm = create_projection_map("box", {"lower": 0.0, "upper": 1.0}, 2)
    return MIPLIB2017ObjectiveFunction(
        MIPLIBInputArgs(A=A, c=c, projection_map=pm, b_vec=b, equality_mask=None)
    )


def test_stop_condition_halts_early():
    obj = _problem()
    base = obj.convergence_stop_condition(tol=5e-3, gamma=1e-3)
    checks = []

    def stop(iteration, dual_val):
        checks.append(iteration)
        return base(iteration, dual_val)

    solver = AcceleratedGradientDescent(
        max_iter=5000, gamma=1e-3, stop_condition=stop, stop_check_every=50
    )
    res = solver.maximize(obj, jnp.zeros(2, jnp.float32))
    assert len(res.dual_objective_log) < 5000, "should have stopped early"
    assert len(res.dual_objective_log) % 50 == 0
    assert checks == list(range(50, len(res.dual_objective_log) + 1, 50))
    assert abs(res.dual_objective - (-5.0 / 7.0)) < 2e-2


def test_no_stop_condition_runs_all_iterations():
    obj = _problem()
    solver = AcceleratedGradientDescent(max_iter=120, gamma=1e-3)
    res = solver.maximize(obj, jnp.zeros(2, jnp.float32))
    assert len(res.dual_objective_log) == 120


def test_never_true_condition_runs_all_iterations():
    obj = _problem()
    solver = AcceleratedGradientDescent(
        max_iter=120, gamma=1e-3, stop_condition=lambda i, d: False, stop_check_every=40
    )
    res = solver.maximize(obj, jnp.zeros(2, jnp.float32))
    assert len(res.dual_objective_log) == 120
