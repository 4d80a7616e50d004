"""Mesh-sharded general-LP (MIPLIB) objective tests.

Beyond-parity: the reference's general-LP objective was single-device only
(reference ``miplib.py:28-109``); here A shards over a 1-D mesh — dense by
variable columns (GSPMD matmuls), sparse by nonzeros (shard_map + psum) —
and must agree with the single-device path to fp32 reorder tolerance.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dualip_tpu.objectives.miplib import MIPLIB2017ObjectiveFunction, MIPLIBInputArgs
from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
from dualip_tpu.parallel.mesh import default_mesh
from dualip_tpu.projections import create_projection_map
from dualip_tpu.sparse import csc_from_dense


def _random_lp(seed=0, m=12, n=40, sparse=False):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, n)).astype(np.float32)
    if sparse:
        A[rng.random(size=(m, n)) < 0.6] = 0.0
        A[:, 0] = np.where(A[:, 0] == 0, 0.5, A[:, 0])  # no empty col 0
    c = rng.normal(size=n).astype(np.float32)
    b = np.abs(rng.normal(size=m)).astype(np.float32) + 0.5
    pm = create_projection_map("box", {"l": 0.0, "u": 1.0}, n)
    eq = np.zeros(m, dtype=bool)
    eq[0] = True
    A_in = csc_from_dense(A) if sparse else A
    return MIPLIBInputArgs(A=A_in, c=c, projection_map=pm, b_vec=b, equality_mask=eq)


@pytest.mark.parametrize("sparse", [False, True], ids=["dense", "sparse"])
@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_calculate_matches_single(sparse, n_devices):
    args = _random_lp(seed=1, sparse=sparse)
    lam = jnp.asarray(np.random.default_rng(2).normal(size=12).astype(np.float32))

    single = MIPLIB2017ObjectiveFunction(args).calculate(lam, gamma=1e-2)
    sharded = MIPLIB2017ObjectiveFunction(args, mesh=default_mesh(n_devices)).calculate(
        lam, gamma=1e-2
    )

    np.testing.assert_allclose(
        np.asarray(single.dual_gradient), np.asarray(sharded.dual_gradient), atol=1e-5
    )
    assert np.isclose(float(single.dual_objective), float(sharded.dual_objective), rtol=1e-6, atol=1e-5)
    assert np.isclose(float(single.reg_penalty), float(sharded.reg_penalty), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("sparse", [False, True], ids=["dense", "sparse"])
def test_sharded_solve_matches_single(sparse):
    args = _random_lp(seed=3, sparse=sparse)

    def solve(mesh=None):
        obj = MIPLIB2017ObjectiveFunction(args, mesh=mesh)
        solver = AcceleratedGradientDescent(
            max_iter=40, gamma=1e-2, initial_step_size=1e-3, max_step_size=1e-1
        )
        return solver.maximize(obj, jnp.zeros(12, jnp.float32))

    ref = solve()
    got = solve(default_mesh(4))
    np.testing.assert_allclose(
        np.asarray(got.dual_objective_log), np.asarray(ref.dual_objective_log), atol=5e-4
    )
    np.testing.assert_allclose(np.asarray(got.dual_val), np.asarray(ref.dual_val), atol=1e-4)


def test_sharded_jacobi_and_certificate():
    """Jacobi row scaling and the PDLP certificate work through the mesh path."""
    args = _random_lp(seed=5, sparse=True)
    mesh = default_mesh(2)
    obj = MIPLIB2017ObjectiveFunction(args, use_jacobi_precondition=True, mesh=mesh)
    ref = MIPLIB2017ObjectiveFunction(args, use_jacobi_precondition=True)
    lam = jnp.asarray(np.abs(np.random.default_rng(6).normal(size=12)).astype(np.float32))
    a = obj.calculate(lam, gamma=1e-2)
    b = ref.calculate(lam, gamma=1e-2)
    np.testing.assert_allclose(np.asarray(a.dual_gradient), np.asarray(b.dual_gradient), atol=1e-5)

    bounds_sharded = obj.calculate_convergence_bound(lam, tol=1e-4)
    bounds_single = ref.calculate_convergence_bound(lam, tol=1e-4)
    for s, r in zip(bounds_sharded[:4], bounds_single[:4]):
        if not (np.isnan(float(s)) and np.isnan(float(r))):
            assert np.isclose(float(s), float(r), rtol=1e-5, atol=1e-6)
    assert bounds_sharded[4] == bounds_single[4]


def test_joint_entry_spanning_even_split_snaps_and_solves():
    """A simplex (joint) entry straddling the even n/S column boundary no
    longer raises (VERDICT r4 #8): shard cuts snap to the entry's hull and
    the uneven-shard solve matches single-device."""
    from dualip_tpu.projections.base import ProjectionEntry

    m, n, S = 12, 40, 8  # even split would cut every 5 columns
    rng = np.random.default_rng(13)
    A = rng.normal(size=(m, n)).astype(np.float32)
    A[rng.random(size=(m, n)) < 0.5] = 0.0
    A[:, 0] = np.where(A[:, 0] == 0, 0.5, A[:, 0])
    c = rng.normal(size=n).astype(np.float32)
    b = np.abs(rng.normal(size=m)).astype(np.float32) + 0.5
    pm = {
        "blk": ProjectionEntry("simplex", {"z": 1.0}, np.arange(3, 8)),  # spans cut at 5
        "blk2": ProjectionEntry("simplex", {"z": 1.0}, np.arange(33, 39)),  # spans cut at 35
        "rest": ProjectionEntry(
            "box", {"l": 0.0, "u": 1.0}, np.concatenate([np.arange(0, 3), np.arange(8, 33), np.arange(39, 40)])
        ),
    }
    args = MIPLIBInputArgs(A=csc_from_dense(A), c=c, projection_map=pm, b_vec=b)
    lam = jnp.asarray(np.abs(np.random.default_rng(14).normal(size=m)).astype(np.float32))

    single = MIPLIB2017ObjectiveFunction(args)
    sharded = MIPLIB2017ObjectiveFunction(args, mesh=default_mesh(S))
    bounds = sharded.ops._bounds
    assert not any(3 < b_ < 8 for b_ in bounds) and not any(33 < b_ < 39 for b_ in bounds)

    a = single.calculate(lam, gamma=1e-2, save_primal=True)
    b_ = sharded.calculate(lam, gamma=1e-2, save_primal=True)
    np.testing.assert_allclose(np.asarray(a.dual_gradient), np.asarray(b_.dual_gradient), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.primal_var), np.asarray(b_.primal_var), atol=1e-5)
    assert np.isclose(float(a.dual_objective), float(b_.dual_objective), rtol=1e-6, atol=1e-5)

    # rare-path matvecs honor the snapped (uneven) shard packing
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sharded.ops.matvec(x)), A @ np.asarray(x), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sharded.ops.rmatvec(lam)), A.T @ np.asarray(lam), atol=1e-4
    )


def test_snap_bounds_unit():
    from dualip_tpu.objectives.miplib import _ColShardedSparseOps

    snap = _ColShardedSparseOps._snap_bounds
    # no atoms: even split
    assert list(snap(40, 8, [])) == [0, 5, 10, 15, 20, 25, 30, 35, 40]
    # atom straddling a cut snaps to the nearer edge (ties break low)
    assert list(snap(40, 8, [(4, 6)])) == [0, 4, 10, 15, 20, 25, 30, 35, 40]
    assert list(snap(40, 8, [(13, 16)])) == [0, 5, 10, 16, 20, 25, 30, 35, 40]
    # giant atom: cuts collapse to its edges (empty shards, still monotone)
    bb = list(snap(40, 8, [(0, 30)]))
    assert bb[0] == 0 and bb[-1] == 40 and all(x <= y for x, y in zip(bb, bb[1:]))
    assert not any(0 < x < 30 for x in bb)


def test_sharded_via_run_solver():
    """compute_device_num > 1 routes the miplib2017 path onto a mesh."""
    from dualip_tpu import run_solver
    from dualip_tpu.types import ComputeArgs, ObjectiveArgs, SolverArgs

    args = _random_lp(seed=7, sparse=True)
    common = dict(
        input_args=args,
        solver_args=SolverArgs(max_iter=20, initial_step_size=1e-3, gamma=1e-2, max_step_size=1e-1),
    )
    ref = run_solver(
        compute_args=ComputeArgs(host_device="cpu", compute_device_num=1),
        objective_args=ObjectiveArgs(objective_type="miplib2017"),
        **common,
    )
    got = run_solver(
        compute_args=ComputeArgs(host_device="cpu", compute_device_num=4),
        objective_args=ObjectiveArgs(objective_type="miplib2017"),
        **common,
    )
    assert np.isclose(got.dual_objective, ref.dual_objective, rtol=1e-5, atol=1e-4)


def test_sharded_sparse_comm_volume_is_O_m():
    """The design law (SURVEY §2.2; reference ``docs/solver/index.rst:128-130``):
    per-iteration communication is O(m), independent of n.  Round 3 violated
    it for the general-LP mesh path (nnz-sharded COO psum'd the full
    (n,)-vector ``A^T λ``); the column-sharded formulation keeps everything
    n-sized shard-local.  Assert on the compiled HLO: no collective moves
    more than O(m) elements even with n >> m."""
    import re

    import jax

    m, n = 8, 4096
    rng = np.random.default_rng(11)
    A = rng.normal(size=(m, n)).astype(np.float32)
    A[rng.random(size=(m, n)) < 0.7] = 0.0
    A[:, 0] = np.where(A[:, 0] == 0, 0.5, A[:, 0])
    c = rng.normal(size=n).astype(np.float32)
    b = np.abs(rng.normal(size=m)).astype(np.float32) + 0.5
    pm = create_projection_map("box", {"l": 0.0, "u": 1.0}, n)
    args = MIPLIBInputArgs(A=csc_from_dense(A), c=c, projection_map=pm, b_vec=b)

    obj = MIPLIB2017ObjectiveFunction(args, mesh=default_mesh(8))
    lam = jnp.zeros(m, jnp.float32)
    g = jnp.asarray(np.float32(1e-2))
    txt = jax.jit(obj._calculate_full).lower(lam, g).compile().as_text()

    # every collective operand must be <= 4m elements (m-vector + scalars,
    # with slack for fused tuples); an n-sized collective (4096) must not appear
    offenders = []
    for op, shapes in re.findall(
        r"(all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter)"
        r"[^(]*\(([^)]*)\)",
        txt,
    ):
        for dt, dims in re.findall(r"(f32|bf16|s32|u32|f64)\[([0-9,]*)\]", shapes):
            elems = 1
            for d in dims.split(","):
                if d:
                    elems *= int(d)
            if elems > 4 * m:
                offenders.append((op, dt, dims, elems))
    assert not offenders, f"O(n)-sized collectives in compiled HLO: {offenders}"
    # sanity: the (m,)-gradient all-reduce IS there
    assert "all-reduce" in txt
