"""Tests for the box-cut projection (box ∩ sum-cut polytope).

Capability extension beyond the torch reference (see
``dualip_tpu/projections/box_cut.py``); correctness is pinned three ways:
equivalence to the Duchi simplex oracle on the overlapping parameter range,
direct feasibility + optimality (projection) properties, and parity of the
fused-kernel branch with the registry operator.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dualip_tpu.projections import duchi_project, project
from dualip_tpu.projections.box_cut import box_cut_project


def test_reduces_to_simplex_when_box_is_unit():
    """With l=0, u=z the box-cut set IS the z-simplex (eq and ineq).

    Comparison domain: for the INEQUALITY case the reference Duchi's initial
    ``clamp(v, 0)`` is a no-op on the result (``max(max(v,0)-nu, 0) ==
    max(v-nu, 0)`` for the KKT shift ``nu >= 0``), so general inputs compare.
    For the EQUALITY case the reference deliberately projects the CLAMPED
    vector (reference ``simplex.py:148``; ``nu`` may be negative, so clamping
    first changes the answer on negative entries), while box_cut computes the
    true projection of ``v`` itself — so the eq comparison uses nonnegative
    inputs, where both coincide.
    """
    rng = np.random.default_rng(0)
    for z in (1.0, 2.5):
        v = rng.normal(size=(40, 7)).astype(np.float32) * 1.5
        ours = box_cut_project(jnp.asarray(v), lower=0.0, upper=z, z=z, inequality=True)
        oracle = duchi_project(jnp.asarray(v), z=z, inequality=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle), atol=2e-6)

        vp = np.abs(v)
        ours = box_cut_project(jnp.asarray(vp), lower=0.0, upper=z, z=z, inequality=False)
        oracle = duchi_project(jnp.asarray(vp), z=z, inequality=False)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle), atol=2e-6)


@pytest.mark.parametrize("ineq", [False, True])
def test_feasibility_and_optimality(ineq):
    rng = np.random.default_rng(1)
    L, B = 9, 60
    lower, upper, z = -0.3, 0.8, 1.7  # L*lower = -2.7 <= z <= 7.2 = L*upper
    v = rng.normal(size=(B, L)).astype(np.float32) * 2
    x = np.asarray(box_cut_project(jnp.asarray(v), lower, upper, z, inequality=ineq))

    assert (x >= lower - 1e-5).all() and (x <= upper + 1e-5).all()
    sums = x.sum(axis=-1)
    if ineq:
        assert (sums <= z + 1e-4).all()
    else:
        np.testing.assert_allclose(sums, z, atol=1e-4)

    # projection optimality: no random feasible point is closer to v
    for _ in range(200):
        y = rng.uniform(lower, upper, size=L).astype(np.float32)
        target = rng.uniform(L * lower, z) if ineq else z
        # rescale onto the cut facet (shift keeps the box only approximately,
        # so clip and only keep exactly-feasible candidates)
        y = y + (target - y.sum()) / L
        y = np.clip(y, lower, upper)
        ok = y.sum() <= z + 1e-6 if ineq else abs(y.sum() - z) < 1e-4
        if not ok:
            continue
        d_proj = np.linalg.norm(v - x, axis=-1)
        d_y = np.linalg.norm(v - y[None, :], axis=-1)
        assert (d_proj <= d_y + 1e-4).all()


def test_inequality_passthrough_and_idempotence():
    rng = np.random.default_rng(2)
    lower, upper, z = 0.0, 1.0, 2.0
    v = rng.uniform(0.0, 0.4, size=(30, 5)).astype(np.float32)  # sums <= 2
    out = np.asarray(box_cut_project(jnp.asarray(v), lower, upper, z, inequality=True))
    np.testing.assert_allclose(out, v, atol=1e-6)  # already feasible
    # idempotence (eq): projecting a projection is a fixed point
    w = box_cut_project(jnp.asarray(v * 3), lower, upper, z, inequality=False)
    w2 = box_cut_project(w, lower, upper, z, inequality=False)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=2e-6)


def test_registry_and_schema_aliases():
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
    a = project("box_cut_eq", lower=-0.5, upper=1.5, z=2.0)(v)
    b = project("box_cut_eq", l=-0.5, u=1.5, z=2.0)(v)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    c = project("box_cut", z=1.0)(v)  # defaults: unit box
    d = box_cut_project(v, 0.0, 1.0, 1.0, inequality=True)
    np.testing.assert_allclose(np.asarray(c), np.asarray(d))


def test_invalid_parameters_raise():
    with pytest.raises(ValueError):
        project("box_cut", lower=1.0, upper=0.0, z=1.0)
    with pytest.raises(ValueError):
        project("box_cut_eq", method="duchi")
    with pytest.raises(ValueError):
        project("box_cut", lower=float("nan"), z=1.0)  # NaN = absent bound
    # empty polytope: z outside [L*l, L*u]
    v = jnp.zeros((4, 3), jnp.float32)
    with pytest.raises(ValueError):
        project("box_cut_eq", lower=0.0, upper=1.0, z=5.0)(v)
    with pytest.raises(ValueError):
        project("box_cut", lower=0.5, upper=1.0, z=0.1)(v)


def test_bfloat16_close_to_fp32():
    rng = np.random.default_rng(4)
    v = rng.normal(size=(20, 6)).astype(np.float32)
    x32 = np.asarray(box_cut_project(jnp.asarray(v), -0.2, 0.9, 1.3, inequality=False))
    x16 = np.asarray(
        box_cut_project(jnp.asarray(v, jnp.bfloat16), -0.2, 0.9, 1.3, inequality=False)
    ).astype(np.float32)
    np.testing.assert_allclose(x16, x32, atol=2e-2)


@pytest.mark.parametrize("kind", ["box_cut", "box_cut_eq"])
def test_fused_kernel_branch_matches_registry(kind):
    """The Pallas ``_project_block`` branch (pure jnp) == registry operator."""
    from dualip_tpu.ops.pallas_matching import _project_block

    rng = np.random.default_rng(5)
    L, K = 6, 32
    z_blk = jnp.asarray(rng.normal(size=(L, K)).astype(np.float32) * 1.5)
    length = jnp.full((1, K), L, jnp.int32)
    params = {"lower": -0.4, "upper": 1.1, "z": 1.8}
    out = _project_block(z_blk, kind, params, length, L, axis=0)
    oracle = box_cut_project(
        z_blk.T, params["lower"], params["upper"], params["z"],
        inequality=(kind == "box_cut"),
    ).T
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle), atol=2e-6)


def test_matching_objective_with_box_cut_map():
    """End to end through the matching objective + AGD (csc layout)."""
    import jax

    from dualip_tpu.objectives.matching import (
        MatchingInputArgs,
        MatchingSolverDualObjectiveFunction,
    )
    from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
    from dualip_tpu.projections import create_projection_map
    from dualip_tpu.sparse import csc_from_dense

    rng = np.random.default_rng(6)
    m, n = 5, 24
    dense = rng.uniform(0.2, 1.0, size=(m, n)).astype(np.float32)  # fully dense cols
    cvals = -rng.uniform(0.1, 1.0, size=(m, n)).astype(np.float32)
    b = rng.uniform(0.5, 1.5, m).astype(np.float32)
    pm = create_projection_map("box_cut", {"lower": 0.0, "upper": 0.6, "z": 1.2}, n)
    obj = MatchingSolverDualObjectiveFunction(
        MatchingInputArgs(A=csc_from_dense(dense), c=csc_from_dense(cvals),
                          projection_map=pm, b_vec=b),
        gamma=1e-2,
    )

    # dense oracle for one calculate(): all columns have equal nnz, so tile
    # padding does not enter and the registry operator is the exact semantics
    lam = rng.uniform(0.0, 0.5, m).astype(np.float32)
    res = obj.calculate(lam, gamma=1e-2)
    zmat = (dense * (-lam[:, None] / 1e-2) + (-1 / 1e-2) * cvals).T  # (n, m)... per-column blocks
    # per-entity blocks are the columns: z_j = (-lam/γ)·a_j + (-1/γ)c_j over the m rows
    xcols = np.asarray(box_cut_project(jnp.asarray(zmat), 0.0, 0.6, 1.2, inequality=True))
    grad = (dense * xcols.T).sum(axis=1) - b
    dual_obj = float((cvals * xcols.T).sum() + (1e-2 / 2) * (xcols ** 2).sum() + lam @ grad)
    np.testing.assert_allclose(np.asarray(res.dual_gradient), grad, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(res.dual_objective), dual_obj, rtol=2e-5, atol=2e-5)

    sol = AcceleratedGradientDescent(max_iter=20, gamma=1e-2).maximize(
        obj, jax.numpy.zeros(m, jnp.float32)
    )
    assert np.isfinite(np.asarray(sol.dual_objective_log)).all()
