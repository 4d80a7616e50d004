"""Equality-constraint handling (parity: reference
``tests/test_equality_constraints.py``)."""

import jax.numpy as jnp
import numpy as np

from dualip_tpu.objectives.miplib import MIPLIB2017ObjectiveFunction, MIPLIBInputArgs
from dualip_tpu.optimizers.agd import AcceleratedGradientDescent, project_on_nn_cone
from dualip_tpu.projections import create_projection_map


def test_project_on_nn_cone():
    y = jnp.array([-1.0, -1.0, 2.0, -3.0, 4.0])
    equality_mask = jnp.array([False, True, False, True, False])
    projection = project_on_nn_cone(y, equality_mask)
    assert np.allclose(projection, [0.0, -1.0, 2.0, -3.0, 4.0])


def test_solver_with_equality_constraint():
    """min x1 + 2 x2 s.t. x1 + x2 = 4, 0 <= x1 <= 1, 0 <= x2 -> optimum 7.0
    (reference test_equality_constraints.py:18-61)."""
    A = np.array([[1.0, 1.0]], dtype=np.float32)
    c = np.array([1.0, 2.0], dtype=np.float32)
    b_vec = np.array([4.0], dtype=np.float32)

    gamma = 1e-5
    equality_mask = np.array([True])
    # Only x1 is projected (box [0, 1]); x2 is left unconstrained by the
    # ridge subproblem, exactly as in the reference test (its optimum has
    # x2 = 3 in the interior, so the solve still lands on 7.0).
    projection_map = create_projection_map("box", {"upper": 1}, num_indices=2, indices=[0])

    obj = MIPLIB2017ObjectiveFunction(
        MIPLIBInputArgs(A=A, c=c, projection_map=projection_map, b_vec=b_vec, equality_mask=equality_mask)
    )
    solver = AcceleratedGradientDescent(max_iter=1000, gamma=gamma)
    res = solver.maximize(obj, jnp.array([0.0], dtype=jnp.float32))
    assert abs(res.dual_objective - 7.0) < 1e-4, f"Expected ~7.0, got {res.dual_objective}"
    # The equality row's dual must be allowed to go negative (the optimum is
    # λ* = -2: stationarity of the free variable gives c2 + λ = 0).  A
    # nonnegative-cone projection without the equality mask would pin it at 0.
    assert abs(float(res.dual_val[0]) - (-2.0)) < 1e-3
