"""MovieLens example pipeline tests on a tiny synthetic ratings file."""

import importlib.util
import sys
from pathlib import Path

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "movies_lens_matching",
    Path(__file__).resolve().parents[1] / "examples" / "movielens_matching" / "movies_lens_matching.py",
)
ml = importlib.util.module_from_spec(_spec)
sys.modules[_spec.name] = ml  # dataclass decorator needs the module registered
_spec.loader.exec_module(ml)

from dualip_tpu.sparse import csc_to_dense  # noqa: E402

CSV = """userId,movieId,rating,timestamp
1,10,4.0,111
1,20,3.0,112
2,10,5.0,113
2,30,2.0,114
3,20,1.0,115
1,10,2.0,116
"""


def _write_csv(tmp_path):
    p = tmp_path / "ratings.csv"
    p.write_text(CSV)
    return str(p)


def test_prepare_matching(tmp_path):
    path = _write_csv(tmp_path)
    cfg = ml.MovielensMatchingConfig(ratings_csv_path=path, per_movie_capacity=0.7)
    args, user_map, row_map = ml.prepare_movielens_matching(cfg)

    # 3 users (cols), 3 movies (rows: 10, 20, 30)
    assert args.A.shape == (3, 3)
    assert user_map == {1: 0, 2: 1, 3: 2}
    assert row_map == {0: 10, 1: 20, 2: 30}

    dense_a = csc_to_dense(args.A)
    # user1 rated movies 10,20; user2: 10,30; user3: 20
    expect_a = np.array([[1, 1, 0], [1, 0, 1], [0, 1, 0]], dtype=np.float32).T
    assert np.allclose(dense_a, expect_a.T)

    dense_c = csc_to_dense(args.c)
    # duplicate (1,10) keeps the BEST reward 4.0 -> c = -4
    assert dense_c[0, 0] == -4.0
    assert dense_c[1, 0] == -3.0
    assert dense_c[0, 1] == -5.0
    assert np.allclose(args.b_vec, 0.7)


def test_filtering(tmp_path):
    path = _write_csv(tmp_path)
    cfg = ml.MovielensMatchingConfig(ratings_csv_path=path, min_movie_interactions=2)
    args, user_map, row_map = ml.prepare_movielens_matching(cfg)
    # movie 30 (1 interaction) dropped
    assert args.A.shape[0] == 2
    assert 30 not in row_map.values()


def test_snapshot_roundtrip(tmp_path):
    path = _write_csv(tmp_path)
    cfg = ml.MovielensMatchingConfig(ratings_csv_path=path)
    args, user_map, row_map = ml.prepare_movielens_matching(cfg)
    prefix = str(tmp_path / "snap")
    ml.save_snapshot(args, prefix, user_map, row_map)
    args2, user_map2, row_map2 = ml.load_snapshot(prefix)
    assert user_map2 == user_map and row_map2 == row_map
    assert np.allclose(csc_to_dense(args2.A), csc_to_dense(args.A))
    assert np.allclose(csc_to_dense(args2.c), csc_to_dense(args.c))


def test_fairness_objective_semantics(tmp_path):
    """The fairness extension follows the reference demo's design
    (matching_complex.rst:77-171): same-pattern A_fairness — NO new primal
    variables — dual length m+2, grad[-2:] = ±Σ f⊙x.  Regression: a
    row-appending encoding made the constraints inert (grad exactly 0)."""
    import jax.numpy as jnp

    from dualip_tpu.optimizers.agd import AcceleratedGradientDescent

    path = _write_csv(tmp_path)
    cfg = ml.MovielensMatchingConfig(ratings_csv_path=path, per_movie_capacity=0.7)
    args, *_ = ml.prepare_movielens_matching(cfg)
    m = args.A.shape[0]
    ext = ml.make_fairness_input_args(args, group_a_rows=[0], group_b_rows=[1], tolerance=0.0)
    assert len(np.asarray(ext.b_vec)) == m + 2

    # f shares A's pattern: +a/|A| on group-A rows, -a/|B| on group-B rows
    f = ml.build_fairness_values(args.A, [0], [1])
    assert f.shape == (args.A.nnz,)
    sel_a = args.A.row_indices == 0
    assert np.allclose(f[sel_a], args.A.data[sel_a])
    assert np.allclose(f[args.A.row_indices == 1], -args.A.data[args.A.row_indices == 1])

    obj = ml.FairnessMatchingObjective(ext, gamma=1e-3)
    # at lambda=0 the groups' exposure differs, so the fairness gradient must
    # be NONZERO and antisymmetric (the broken encoding produced exactly 0)
    r0 = obj.calculate(jnp.zeros(m + 2, jnp.float32))
    g0 = np.asarray(r0.dual_gradient)
    assert abs(g0[-2]) > 1e-6 and np.isclose(g0[-2], -g0[-1])

    # solving with delta=0 must shrink the group disparity vs unconstrained.
    # Skewed toy: every user strongly prefers movie 10 (group A), capacities
    # slack — the unconstrained optimum is maximally unfair; gamma=0.05 keeps
    # AGD smooth enough to settle on 4 users.
    skew = "userId,movieId,rating,timestamp\n" + "".join(
        f"{u},10,5.0,0\n{u},20,1.0,0\n" for u in range(1, 5)
    )
    p2 = tmp_path / "skew.csv"
    p2.write_text(skew)
    cfg2 = ml.MovielensMatchingConfig(ratings_csv_path=str(p2), per_movie_capacity=30.0)
    args2, *_ = ml.prepare_movielens_matching(cfg2)
    m2 = args2.A.shape[0]
    ext2 = ml.make_fairness_input_args(args2, group_a_rows=[0], group_b_rows=[1], tolerance=0.0)
    gam = 0.05
    obj_s = ml.FairnessMatchingObjective(ext2, gamma=gam)

    def disparity(dual):
        lam = np.zeros(m2 + 2, np.float32)
        lam[: len(dual)] = dual
        return float(np.asarray(obj_s.calculate(jnp.asarray(lam)).dual_gradient)[-2])

    from dualip_tpu.objectives.matching import MatchingSolverDualObjectiveFunction

    base = MatchingSolverDualObjectiveFunction(args2, gamma=gam)
    res_u = AcceleratedGradientDescent(max_iter=800, gamma=gam).maximize(
        base, jnp.zeros(m2, jnp.float32)
    )
    res_f = AcceleratedGradientDescent(max_iter=800, gamma=gam).maximize(
        obj_s, jnp.zeros(m2 + 2, jnp.float32)
    )
    d_u = abs(disparity(np.asarray(res_u.dual_val)))
    d_f = abs(disparity(np.asarray(res_f.dual_val)))
    assert np.isfinite(res_f.dual_objective)
    assert d_u > 0.5  # the unconstrained optimum really is unfair
    assert d_f < 0.1 * d_u, (d_f, d_u)


def test_fairness_through_run_solver(tmp_path):
    """objective_type='movielens_fairness' via the register_objective
    extension point (the operator-centric story end to end)."""
    from dualip_tpu import ComputeArgs, ObjectiveArgs, SolverArgs, run_solver

    path = _write_csv(tmp_path)
    cfg = ml.MovielensMatchingConfig(ratings_csv_path=path, per_movie_capacity=0.7)
    args, *_ = ml.prepare_movielens_matching(cfg)
    ext = ml.make_fairness_input_args(args, group_a_rows=[0], group_b_rows=[1], tolerance=0.1)
    ml._register_fairness_objective()
    res = run_solver(
        input_args=ext,
        solver_args=SolverArgs(max_iter=30, gamma=1e-3),
        compute_args=ComputeArgs(),
        objective_args=ObjectiveArgs(objective_type="movielens_fairness"),
    )
    assert np.isfinite(res.dual_objective)
    assert len(np.asarray(res.dual_val)) == args.A.shape[0] + 2
