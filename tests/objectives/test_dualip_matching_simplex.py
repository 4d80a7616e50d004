"""5x5 Scala golden-trace matching test
(parity: reference ``tests/objectives/test_dualip_matching_simplex.py``)."""

import jax.numpy as jnp
import numpy as np

from dualip_tpu.objectives.matching import MatchingInputArgs, MatchingSolverDualObjectiveFunction
from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
from dualip_tpu.projections import create_projection_map
from dualip_tpu.sparse import csc_from_dense

# a(i, j): cost for user i / item j (reference test values, Scala dataset)
A_COMPACT = np.array(
    [
        [0.307766110869125, 0.483770735096186, 0.624996477039531, 0.669021712383255, 0.535811153938994],
        [0.257672501029447, 0.812402617651969, 0.882165518123657, 0.204612161964178, 0.710803845431656],
        [0.552322433330119, 0.370320537127554, 0.28035383997485, 0.357524853432551, 0.538348698290065],
        [0.0563831503968686, 0.546558595029637, 0.398487901547924, 0.359475114848465, 0.74897222686559],
        [0.468549283919856, 0.170262051047757, 0.76255108229816, 0.690290528349578, 0.420101450523362],
    ],
    dtype=np.float32,
)

TRUE_VALUES = [
    (2, -3.6010155991401818),
    (16, -3.60842718733725),
    (23, -3.5080258013053136),
    (29, -3.4868496294227143),
]


def set_up_data_scala():
    # users are columns: A = a_compact.T, c = -a_compact.T (reference :95-99)
    A = csc_from_dense(A_COMPACT.T)
    C = csc_from_dense(-A_COMPACT.T)
    b_vec = np.full(5, 0.7, dtype=np.float32)
    return A, C, b_vec


def test_simplex_solver_inequality():
    gamma = 1e-3
    A, C, b_vec = set_up_data_scala()
    projection_map = create_projection_map("simplex", {"z": 1}, A.shape[1])

    objective = MatchingSolverDualObjectiveFunction(
        MatchingInputArgs(A=A, c=C, projection_map=projection_map, b_vec=b_vec, equality_mask=None),
        gamma=gamma,
    )
    solver = AcceleratedGradientDescent(max_iter=30, gamma=gamma)
    res = solver.maximize(objective, jnp.asarray(0.1 * np.ones(5, np.float32)))

    for i, true_val in TRUE_VALUES:
        got = res.dual_objective_log[i - 1]
        assert abs(got - true_val) < 1e-5, f"iter {i}: expected {true_val}, got {got}"


def test_matching_save_primal_and_slacks():
    gamma = 1e-3
    A, C, b_vec = set_up_data_scala()
    pm = create_projection_map("simplex", {"z": 1}, A.shape[1])
    obj = MatchingSolverDualObjectiveFunction(
        MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=b_vec), gamma=gamma
    )
    res = obj.calculate(jnp.zeros(5, jnp.float32), save_primal=True)
    assert res.primal_var is not None and res.primal_var.shape == (A.nnz,)
    # with lambda = 0: x = Proj(-c/gamma) per column; projection onto the
    # z=1 inequality simplex of large positive values sums to 1 per column
    x = np.asarray(res.primal_var)
    col_sums = np.add.reduceat(x, A.indptr[:-1])
    assert np.allclose(col_sums, 1.0, atol=1e-5)
    assert res.max_pos_slack is not None and res.sum_pos_slack is not None
    # dual_objective at lambda=0 equals c.x + reg
    expected_obj = float(np.dot(C.data, x)) + float(np.asarray(res.reg_penalty)) - 0.0
    assert np.isclose(float(np.asarray(res.dual_objective)), expected_obj, atol=1e-4)


def test_matching_gradient_matches_dense_oracle():
    """grad = A x* - b against a dense numpy recomputation."""
    gamma = 0.5
    A, C, b_vec = set_up_data_scala()
    pm = create_projection_map("simplex", {"z": 1}, A.shape[1])
    obj = MatchingSolverDualObjectiveFunction(
        MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=b_vec), gamma=gamma
    )
    lam = np.array([0.1, 0.0, 0.3, 0.0, 0.2], dtype=np.float32)
    res = obj.calculate(jnp.asarray(lam), save_primal=True)
    x = np.asarray(res.primal_var)

    # dense oracle
    from dualip_tpu.sparse import csc_matvec

    grad_oracle = csc_matvec(A._replace(data=A.data * x), np.ones(A.shape[1], np.float32))
    # csc_matvec(A*x, ones) == row-sums of A .* x
    assert np.allclose(np.asarray(res.dual_gradient), grad_oracle - b_vec, atol=1e-5)
