"""MovieLens ratings → matching LP for the TPU solver.

Parity: reference ``examples/movielens_matching/movies_lens_matching.py`` —
the same LP construction:

* users are columns i, movies are rows j; ``A[j,i] = 1`` for every observed
  (user, movie) pair; ``c[j,i] = -(scale·rating + shift)``; duplicate
  (user, movie) pairs keep the best reward (reference ``:66-88``);
* per-movie capacity ``b_j = per_movie_capacity``; per-user
  ``simplex z=1`` projection map (reference ``:39-47, 162``);
* snapshot save/load of A/c/b + id maps (npz+json instead of torch.save,
  reference ``:171-216``); optional min-interaction filtering;
* optional **fairness rows** (the extension demo, reference
  ``docs/demo/matching_complex.rst``): two extra constraints bounding the
  exposure difference between two movie groups.

With the reference defaults (γ=0.1, 10k iters) on MovieLens 20M the final
dual objective is -628,012.875 (``docs/demo/matching.rst:153-158``) and
-275,531.9375 with the two fairness rows — the numeric targets for this
script (BASELINE.md).

The CSV ingestion is fully vectorized (the reference iterated a DataFrame
row-by-row, ``:72-88`` — minutes on 20M ratings).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from dualip_tpu.objectives.matching import MatchingInputArgs  # noqa: E402
from dualip_tpu.projections import create_projection_map  # noqa: E402
from dualip_tpu.sparse import CSCMatrix, csc_from_arrays, vstack_csc  # noqa: E402


@dataclass
class MovielensMatchingConfig:
    ratings_csv_path: str
    per_movie_capacity: float = 1.0
    rating_scale: float = 1.0
    rating_shift: float = 0.0
    min_user_interactions: int = 1
    min_movie_interactions: int = 1
    device: str = "cpu"  # kept for reference API parity; placement is automatic


def load_ratings_csv(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(userId, movieId, rating) arrays from a MovieLens ratings.csv."""
    data = np.genfromtxt(
        path, delimiter=",", skip_header=1, usecols=(0, 1, 2), dtype=np.float64
    )
    if data.ndim == 1:
        data = data[None, :]
    return data[:, 0].astype(np.int64), data[:, 1].astype(np.int64), data[:, 2]


def prepare_movielens_matching(
    config: MovielensMatchingConfig,
    ratings: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
) -> Tuple[MatchingInputArgs, Dict[int, int], Dict[int, int]]:
    """Build MatchingInputArgs from ratings (reference ``:117-168``).

    Returns (input_args, user_id_to_col, row_to_movie_id).
    """
    if ratings is None:
        ratings = load_ratings_csv(config.ratings_csv_path)
    users, movies, rating_vals = ratings

    # Optional filtering of sparse users/movies (reference :134-141).
    if config.min_user_interactions > 1:
        uniq, counts = np.unique(users, return_counts=True)
        keep = np.isin(users, uniq[counts >= config.min_user_interactions])
        users, movies, rating_vals = users[keep], movies[keep], rating_vals[keep]
    if config.min_movie_interactions > 1:
        uniq, counts = np.unique(movies, return_counts=True)
        keep = np.isin(movies, uniq[counts >= config.min_movie_interactions])
        users, movies, rating_vals = users[keep], movies[keep], rating_vals[keep]

    unique_users = np.unique(users)
    unique_movies = np.unique(movies)
    cols = np.searchsorted(unique_users, users)
    rows = np.searchsorted(unique_movies, movies)
    n_cols, n_rows = len(unique_users), len(unique_movies)

    c_vals = -(config.rating_scale * rating_vals + config.rating_shift)

    # Deduplicate (user, movie) keeping the best reward (min c), vectorized:
    # sort by (key, c) and keep the first entry per key.
    key = cols * np.int64(n_rows) + rows
    order = np.lexsort((c_vals, key))
    key_sorted = key[order]
    first = np.ones(len(key_sorted), dtype=bool)
    first[1:] = key_sorted[1:] != key_sorted[:-1]
    sel = order[first]
    # CSC order: sel sorted by key == (col, row) — already sorted by key_sorted[first]
    cols_f = cols[sel]
    rows_f = rows[sel]
    c_f = c_vals[sel].astype(np.float32)

    counts = np.bincount(cols_f, minlength=n_cols)
    indptr = np.zeros(n_cols + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])

    A = csc_from_arrays(indptr, rows_f, np.ones(len(rows_f), np.float32), (n_rows, n_cols))
    C = csc_from_arrays(indptr, rows_f, c_f, (n_rows, n_cols))
    b_vec = np.full(n_rows, np.float32(config.per_movie_capacity))

    projection_map = create_projection_map("simplex", {"z": 1}, num_indices=n_cols)
    input_args = MatchingInputArgs(
        A=A, c=C, projection_map=projection_map, b_vec=b_vec, equality_mask=None
    )
    user_id_to_col = {int(u): i for i, u in enumerate(unique_users)}
    row_to_movie_id = {i: int(m) for i, m in enumerate(unique_movies)}
    return input_args, user_id_to_col, row_to_movie_id


def add_fairness_rows(
    input_args: MatchingInputArgs,
    group_a_rows: Sequence[int],
    group_b_rows: Sequence[int],
    tolerance: float = 0.0,
) -> MatchingInputArgs:
    """Append two fairness constraints bounding group exposure disparity
    (the reference's extension demo, ``docs/demo/matching_complex.rst``):

        sum_{j in A} (Ax)_j - sum_{j in B} (Ax)_j <= tolerance
        sum_{j in B} (Ax)_j - sum_{j in A} (Ax)_j <= tolerance
    """
    A = input_args.A
    in_a = np.isin(A.row_indices, np.asarray(group_a_rows, dtype=np.int32))
    in_b = np.isin(A.row_indices, np.asarray(group_b_rows, dtype=np.int32))
    sign = np.where(in_a, 1.0, np.where(in_b, -1.0, 0.0)).astype(np.float32)

    def _fair_row(vals):
        # one CSC row: per user-column, the summed signed exposure coefficient
        signed = vals * A.data
        col_sums = np.zeros(A.shape[1], dtype=np.float64)
        nonempty = A.col_lengths > 0
        if nonempty.any():
            col_sums[nonempty] = np.add.reduceat(signed, A.indptr[:-1][nonempty])
        nz = col_sums != 0
        indptr = np.zeros(A.shape[1] + 1, dtype=np.int64)
        np.cumsum(nz.astype(np.int64), out=indptr[1:])
        return CSCMatrix(
            indptr=indptr,
            row_indices=np.zeros(int(nz.sum()), dtype=np.int32),
            data=col_sums[nz].astype(np.float32),
            shape=(1, A.shape[1]),
        )

    fair_plus = _fair_row(sign)
    fair_minus = _fair_row(-sign)
    A_ext = vstack_csc([A, fair_plus, fair_minus])
    # c keeps the same extended pattern with zero cost on fairness entries
    C_ext = vstack_csc(
        [input_args.c, fair_plus._replace(data=np.zeros_like(fair_plus.data)),
         fair_minus._replace(data=np.zeros_like(fair_minus.data))]
    )
    b_ext = np.concatenate(
        [np.asarray(input_args.b_vec), np.float32([tolerance, tolerance])]
    ).astype(np.float32)
    return MatchingInputArgs(
        A=A_ext,
        c=C_ext,
        projection_map=input_args.projection_map,
        b_vec=b_ext,
        equality_mask=None,
    )


def save_snapshot(input_args, out_prefix, user_id_to_col, row_to_movie_id) -> None:
    """npz+json snapshot (reference used torch.save, ``:171-190``)."""
    A, C = input_args.A, input_args.c
    np.savez(
        f"{out_prefix}.npz",
        indptr=A.indptr,
        row_indices=A.row_indices,
        a_data=A.data,
        c_data=C.data,
        b_vec=np.asarray(input_args.b_vec),
        shape=np.asarray(A.shape),
    )
    Path(f"{out_prefix}_user_map.json").write_text(json.dumps(user_id_to_col))
    Path(f"{out_prefix}_row_to_movie.json").write_text(json.dumps(row_to_movie_id))


def load_snapshot(in_prefix):
    with np.load(f"{in_prefix}.npz") as d:
        shape = tuple(d["shape"])
        A = csc_from_arrays(d["indptr"], d["row_indices"], d["a_data"], shape)
        C = csc_from_arrays(d["indptr"], d["row_indices"], d["c_data"], shape)
        b_vec = d["b_vec"]
    projection_map = create_projection_map("simplex", {"z": 1}, num_indices=shape[1])
    input_args = MatchingInputArgs(
        A=A, c=C, projection_map=projection_map, b_vec=b_vec, equality_mask=None
    )
    user_map = {int(k): int(v) for k, v in json.loads(Path(f"{in_prefix}_user_map.json").read_text()).items()}
    row_map = {int(k): int(v) for k, v in json.loads(Path(f"{in_prefix}_row_to_movie.json").read_text()).items()}
    return input_args, user_map, row_map


def main():
    parser = argparse.ArgumentParser(description="MovieLens ratings -> matching LP (TPU solver).")
    parser.add_argument("--ratings_csv_path", type=str, default=None)
    parser.add_argument("--per_movie_capacity", type=float, default=30.0)
    parser.add_argument("--rating_scale", type=float, default=1.0)
    parser.add_argument("--rating_shift", type=float, default=0.0)
    parser.add_argument("--min_user_interactions", type=int, default=1)
    parser.add_argument("--min_movie_interactions", type=int, default=1)
    parser.add_argument("--device", type=str, default=None, help="cpu | tpu (default ambient)")
    parser.add_argument("--run_solver", action="store_true")
    parser.add_argument("--gamma", type=float, default=0.1)
    parser.add_argument("--max_iter", type=int, default=10000)
    parser.add_argument("--initial_step_size", type=float, default=1e-8)
    parser.add_argument("--max_step_size", type=float, default=1e-6)
    parser.add_argument("--out_prefix", type=str, default=None)
    parser.add_argument("--in_prefix", type=str, default=None)
    parser.add_argument("--fairness_group_a", type=str, default=None, help="comma-separated movie row ids")
    parser.add_argument("--fairness_group_b", type=str, default=None)
    parser.add_argument("--fairness_tolerance", type=float, default=0.0)
    args = parser.parse_args()

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    if args.in_prefix:
        input_args, user_map, row_to_movie = load_snapshot(args.in_prefix)
    else:
        if not args.ratings_csv_path:
            parser.error("--ratings_csv_path or --in_prefix is required")
        t0 = time.perf_counter()
        input_args, user_map, row_to_movie = prepare_movielens_matching(
            MovielensMatchingConfig(
                ratings_csv_path=args.ratings_csv_path,
                per_movie_capacity=args.per_movie_capacity,
                rating_scale=args.rating_scale,
                rating_shift=args.rating_shift,
                min_user_interactions=args.min_user_interactions,
                min_movie_interactions=args.min_movie_interactions,
            )
        )
        print(f"prepared in {time.perf_counter()-t0:.1f}s")

    if args.fairness_group_a and args.fairness_group_b:
        ga = [int(x) for x in args.fairness_group_a.split(",")]
        gb = [int(x) for x in args.fairness_group_b.split(",")]
        input_args = add_fairness_rows(input_args, ga, gb, args.fairness_tolerance)
        print(f"added 2 fairness rows (|A|={len(ga)}, |B|={len(gb)})")

    print(f"A shape: {input_args.A.shape}, nnz: {input_args.A.nnz}, b shape: {np.asarray(input_args.b_vec).shape}")

    if args.out_prefix:
        save_snapshot(input_args, args.out_prefix, user_map, row_to_movie)
        print(f"snapshot saved to {args.out_prefix}*")

    if args.run_solver:
        from dualip_tpu import ComputeArgs, ObjectiveArgs, SolverArgs, run_solver

        result = run_solver(
            input_args=input_args,
            solver_args=SolverArgs(
                gamma=args.gamma,
                max_iter=args.max_iter,
                initial_step_size=args.initial_step_size,
                max_step_size=args.max_step_size,
            ),
            compute_args=ComputeArgs(host_device=args.device or "cpu"),
            objective_args=ObjectiveArgs(objective_type="matching"),
        )
        print("Dual objective:", result.dual_objective)


if __name__ == "__main__":
    main()
