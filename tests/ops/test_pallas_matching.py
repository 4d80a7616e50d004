"""Pallas fused-kernel tests (interpret mode on CPU) vs the jnp/Duchi path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dualip_tpu.objectives.matching import (
    MatchingInputArgs,
    MatchingSolverDualObjectiveFunction,
)
from dualip_tpu.ops.pallas_matching import fused_tile_eval_T
from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
from dualip_tpu.projections import create_projection_map
from dualip_tpu.projections.simplex import duchi_project
from dualip_tpu.sparse import csc_from_dense

from tests.objectives.test_dualip_matching_simplex import TRUE_VALUES, set_up_data_scala


def _random_tile(rng, L, K, m):
    a = np.abs(rng.normal(size=(L, K))).astype(np.float32)
    c = -np.abs(rng.normal(size=(L, K))).astype(np.float32)
    length = rng.integers(1, L + 1, size=K).astype(np.int32)
    mask = np.arange(L)[:, None] < length[None, :]
    a = np.where(mask, a, 0)
    c = np.where(mask, c, 0)
    rows = rng.integers(0, m, size=(L, K)).astype(np.int32)
    return a, c, length, mask, rows


@pytest.mark.parametrize("kind,params", [
    ("simplex", (("z", 1.0),)),
    ("simplex", (("z", 2.5),)),
    ("simplex_eq", (("z", 1.0),)),
    ("box", (("lower", 0.0), ("upper", 1.0))),
    # Regression: the kernel must honor the registered operators' full schema
    # — defaults [0, 1], the 'l'/'u' alias keys, and NaN-coded absent bounds —
    # not just explicit 'lower'/'upper'.
    ("box", ()),
    ("box", (("l", -0.5), ("u", 0.5))),
    ("box", (("lower", float("nan")), ("upper", 0.25))),
    ("cone", (("lower", 0.0),)),
    ("cone", (("u", 0.1),)),
    ("identity", ()),
])
def test_fused_kernel_matches_jnp(kind, params):
    rng = np.random.default_rng(0)
    L, K, m = 8, 1024, 64
    a, c, length, mask, rows = _random_tile(rng, L, K, m)
    lam = np.abs(rng.normal(size=m)).astype(np.float32)
    nig = np.float32(-100.0)
    lam_g = (nig * lam)[rows]
    z = a * lam_g + nig * c

    ax, obj, reg = fused_tile_eval_T(
        jnp.asarray(lam_g), jnp.asarray(a), jnp.asarray(c), jnp.asarray(length),
        nig, kind, params, block_k=512, interpret=True,
    )

    # jnp oracle via the registry path on the (K, L) layout
    from dualip_tpu.projections.base import project

    if kind == "identity":
        x_o = z.T
    else:
        x_o = np.asarray(project(kind, **dict(params))(jnp.asarray(z.T)))
    x_o = np.where(mask.T, x_o, 0).T
    tol = 5e-5 * max(1.0, np.abs(x_o).max())
    assert np.allclose(np.asarray(ax), a * x_o, atol=tol), np.abs(np.asarray(ax) - a * x_o).max()
    assert np.isclose(float(obj), np.sum(c * x_o), rtol=1e-4, atol=1e-3)
    assert np.isclose(float(reg), np.sum(x_o * x_o), rtol=1e-4, atol=1e-3)


def test_pallas_objective_golden_trace():
    """The fused-kernel objective reproduces the 5x5 Scala golden trace."""
    gamma = 1e-3
    A, C, b_vec = set_up_data_scala()
    pm = create_projection_map("simplex", {"z": 1}, A.shape[1])
    obj = MatchingSolverDualObjectiveFunction(
        MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=b_vec),
        gamma=gamma,
        use_pallas=True,
        pallas_block_k=8,  # tiny problem: K padded to 8
    )
    solver = AcceleratedGradientDescent(max_iter=30, gamma=gamma)
    res = solver.maximize(obj, jnp.asarray(0.1 * np.ones(5, np.float32)))
    for i, true_val in TRUE_VALUES:
        got = res.dual_objective_log[i - 1]
        assert abs(got - true_val) < 1e-5, f"iter {i}: {got} vs {true_val}"


def test_pallas_matches_jnp_objective_on_random_problem():
    rng = np.random.default_rng(3)
    m, n = 32, 300
    dense = np.abs(rng.normal(size=(m, n))).astype(np.float32)
    dense[rng.random(size=(m, n)) < 0.7] = 0.0
    dense[0] = np.where(dense[0] == 0, 0.1, dense[0])
    A = csc_from_dense(dense)
    C = csc_from_dense(np.where(dense != 0, -dense, 0).astype(np.float32))
    b = np.abs(rng.normal(size=m)).astype(np.float32)
    pm = create_projection_map("simplex", {"z": 1}, n)
    lam = jnp.asarray(np.abs(rng.normal(size=m)).astype(np.float32))

    base = MatchingSolverDualObjectiveFunction(
        MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=b), gamma=1e-2
    ).calculate(lam)
    fused = MatchingSolverDualObjectiveFunction(
        MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=b),
        gamma=1e-2,
        use_pallas=True,
        pallas_block_k=64,
    ).calculate(lam)

    assert np.allclose(np.asarray(base.dual_gradient), np.asarray(fused.dual_gradient), atol=1e-4)
    assert np.isclose(float(base.dual_objective), float(fused.dual_objective), rtol=1e-4, atol=1e-3)
    assert np.isclose(float(base.reg_penalty), float(fused.reg_penalty), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n_devices", [2, 4])
def test_pallas_sharded_matches_single_device(n_devices):
    """use_pallas + mesh (shard_map + psum) agrees with the 1-device kernel."""
    from dualip_tpu.parallel.mesh import default_mesh

    rng = np.random.default_rng(7)
    m, n = 16, 200
    dense = np.abs(rng.normal(size=(m, n))).astype(np.float32)
    dense[rng.random(size=(m, n)) < 0.6] = 0.0
    dense[0] = np.where(dense[0] == 0, 0.1, dense[0])
    A = csc_from_dense(dense)
    C = csc_from_dense(np.where(dense != 0, -dense, 0).astype(np.float32))
    b = np.abs(rng.normal(size=m)).astype(np.float32)
    pm = create_projection_map("simplex", {"z": 1}, n)
    lam = jnp.asarray(np.abs(rng.normal(size=m)).astype(np.float32))

    single = MatchingSolverDualObjectiveFunction(
        MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=b),
        gamma=1e-2,
        use_pallas=True,
        pallas_block_k=16,
    ).calculate(lam)
    sharded = MatchingSolverDualObjectiveFunction(
        MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=b),
        gamma=1e-2,
        mesh=default_mesh(n_devices),
        use_pallas=True,
        pallas_block_k=16,
    ).calculate(lam)

    assert np.allclose(
        np.asarray(single.dual_gradient), np.asarray(sharded.dual_gradient), atol=1e-5
    )
    assert np.isclose(float(single.dual_objective), float(sharded.dual_objective), rtol=1e-5, atol=1e-4)
    assert np.isclose(float(single.reg_penalty), float(sharded.reg_penalty), rtol=1e-5, atol=1e-5)


def test_pallas_sharded_golden_trace():
    """Full 30-iteration solve through shard_map'd fused kernels reproduces
    the 5x5 Scala golden trace (reference
    tests/objectives/test_dualip_matching_simplex.py:129-141)."""
    from dualip_tpu.parallel.mesh import default_mesh

    gamma = 1e-3
    A, C, b_vec = set_up_data_scala()
    pm = create_projection_map("simplex", {"z": 1}, A.shape[1])
    obj = MatchingSolverDualObjectiveFunction(
        MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=b_vec),
        gamma=gamma,
        mesh=default_mesh(2),
        use_pallas=True,
        pallas_block_k=8,
    )
    solver = AcceleratedGradientDescent(max_iter=30, gamma=gamma)
    res = solver.maximize(obj, jnp.asarray(0.1 * np.ones(5, np.float32)))
    for i, true_val in TRUE_VALUES:
        got = res.dual_objective_log[i - 1]
        assert abs(got - true_val) < 1e-5, f"iter {i}: {got} vs {true_val}"
