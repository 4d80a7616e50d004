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


def test_fairness_rows_and_solve(tmp_path):
    import jax.numpy as jnp

    from dualip_tpu.objectives.matching import MatchingSolverDualObjectiveFunction
    from dualip_tpu.optimizers.agd import AcceleratedGradientDescent

    path = _write_csv(tmp_path)
    cfg = ml.MovielensMatchingConfig(ratings_csv_path=path, per_movie_capacity=0.7)
    args, *_ = ml.prepare_movielens_matching(cfg)
    ext = ml.add_fairness_rows(args, group_a_rows=[0], group_b_rows=[1], tolerance=0.1)
    assert ext.A.shape == (5, 3)
    assert len(np.asarray(ext.b_vec)) == 5
    assert np.allclose(np.asarray(ext.b_vec)[-2:], 0.1)

    # fairness rows: +1 per group-A (movie row 0) edge, -1 per group-B edge,
    # aggregated per user column
    dense = csc_to_dense(ext.A)
    assert np.allclose(dense[3], dense[0] - dense[1])
    assert np.allclose(dense[4], dense[1] - dense[0])

    obj = MatchingSolverDualObjectiveFunction(ext, gamma=1e-3)
    solver = AcceleratedGradientDescent(max_iter=50, gamma=1e-3)
    res = solver.maximize(obj, jnp.zeros(5, jnp.float32))
    assert np.isfinite(res.dual_objective)
