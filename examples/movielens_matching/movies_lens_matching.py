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

from dualip_tpu.objectives.matching import (  # noqa: E402
    MatchingInputArgs,
    MatchingSolverDualObjectiveFunction,
)
from dualip_tpu.projections import create_projection_map  # noqa: E402
from dualip_tpu.sparse import CSCMatrix, csc_from_arrays  # noqa: E402


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


def build_fairness_values(
    A: CSCMatrix, group_a_rows: Sequence[int], group_b_rows: Sequence[int]
) -> np.ndarray:
    """Per-nnz fairness coefficients f, SAME sparsity pattern as A
    (reference ``docs/demo/matching_complex.rst:33-60``): entries of A whose
    movie row is in group A carry ``+a/|A|``, group B ``-a/|B|``, others 0 —
    so the two fairness rows bound the difference of the groups' AVERAGE
    a-weighted exposure, without introducing any new primal variables."""
    in_a = np.isin(A.row_indices, np.asarray(group_a_rows, dtype=A.row_indices.dtype))
    in_b = np.isin(A.row_indices, np.asarray(group_b_rows, dtype=A.row_indices.dtype))
    sign = np.where(
        in_a, 1.0 / len(group_a_rows), np.where(in_b, -1.0 / len(group_b_rows), 0.0)
    )
    return (sign * A.data).astype(np.float32)


@dataclass
class FairnessMatchingInputArgs(MatchingInputArgs):
    """MatchingInputArgs + fairness groups; ``b_vec`` is EXTENDED to length
    m+2 = (b, δ, δ) so the dual dimension (and ``run_solver``'s cold-start
    zero dual) covers the two fairness rows."""

    group_a_rows: Tuple[int, ...] = ()
    group_b_rows: Tuple[int, ...] = ()


class FairnessMatchingObjective(MatchingSolverDualObjectiveFunction):
    """Matching objective extended with two group-fairness constraints —
    the reference's extension demo re-done TPU-natively (reference
    ``docs/demo/matching_complex.rst:77-171``):

        mean_{j∈A} (Ax)_j - mean_{j∈B} (Ax)_j <= δ     (dual λ_m)
        mean_{j∈B} (Ax)_j - mean_{j∈A} (Ax)_j <= δ     (dual λ_{m+1})

    The fairness coefficients share A's sparsity pattern (no new primal
    variables): per nonzero, z gains ``f·(-1/γ)(λ_m - λ_{m+1})``, and the two
    extra gradient entries are ``±Σ f⊙x``.  Mirrors the reference demo's
    override of ``calculate`` (its ``intermediate += scaled[-2]·A_f -
    scaled[-1]·A_f`` and ``grad[-2:] = ±Σ(A_f ⊙ intermediate)``), expressed
    over BlockCSC tiles in one traced function.  csc layout only (the
    reference demo likewise extends only the base path).
    """

    def __init__(self, input_args: FairnessMatchingInputArgs, gamma: float, **kw):
        if kw.get("layout", "csc") != "csc" or kw.get("use_pallas") or kw.get("mesh"):
            raise NotImplementedError("the fairness demo extends the csc layout")
        kw.pop("layout", None)
        b_ext = np.asarray(input_args.b_vec, dtype=np.float32)
        base_args = MatchingInputArgs(
            A=input_args.A,
            c=input_args.c,
            projection_map=input_args.projection_map,
            b_vec=b_ext[:-2],
            equality_mask=None,
        )
        super().__init__(base_args, gamma=gamma, **kw)
        from dualip_tpu.sparse.bcsc import flat_to_tiles_values
        import jax

        f_flat = build_fairness_values(
            input_args.A, list(input_args.group_a_rows), list(input_args.group_b_rows)
        )
        self.f_tiles = jax.device_put(flat_to_tiles_values(self.bcsc, f_flat))
        import jax.numpy as jnp

        self.b_ext = jnp.asarray(b_ext)

    @property
    def params(self):
        return (self.bcsc, self.b_ext, self.f_tiles)

    def calculate_traceable(self, params, dual_val, gamma):
        import jax
        import jax.numpy as jnp

        from dualip_tpu.objectives.matching import _finalize
        from dualip_tpu.sparse.bcsc import tile_valid_mask

        bcsc, b_ext, f_tiles = params
        g = self.gamma if gamma is None else gamma
        dtype = dual_val.dtype
        nig = jnp.asarray(-1.0, dtype) / jnp.asarray(g, dtype)
        scaled = nig * dual_val[:-2]
        smu = nig * (dual_val[-2] - dual_val[-1])  # reference: scaled[-2]-scaled[-1]

        grad_rows = jnp.zeros(bcsc.m, dtype=dtype)
        gf = jnp.zeros((), dtype=dtype)
        dual_obj = jnp.zeros((), dtype=dtype)
        reg = jnp.zeros((), dtype=dtype)
        for tile, spec, f in zip(bcsc.tiles, bcsc.specs, f_tiles):
            z = tile.a * scaled[tile.rows] + f * smu + nig * tile.c
            x = spec.projection()(z)
            x = jnp.where(tile_valid_mask(tile, spec.L), x, jnp.zeros((), dtype=dtype))
            grad_rows = grad_rows + jax.ops.segment_sum(
                (tile.a * x).reshape(-1),
                tile.rows.reshape(-1).astype(jnp.int32),
                num_segments=bcsc.m,
            )
            gf = gf + jnp.sum(f * x)
            reg = reg + (jnp.asarray(g, dtype) / 2) * jnp.sum(x * x)
            dual_obj = dual_obj + jnp.sum(tile.c * x)
        grad = jnp.concatenate([grad_rows, gf[None], -gf[None]])
        return _finalize(grad, dual_obj, reg, dual_val, b_ext)

    def calculate(self, dual_val, gamma=None, save_primal=False, rank: int = 0, **kwargs):
        if save_primal:
            raise NotImplementedError("save_primal is not wired into the fairness demo")
        return super().calculate(dual_val, gamma=gamma, save_primal=False, rank=rank, **kwargs)


def make_fairness_input_args(
    input_args: MatchingInputArgs,
    group_a_rows: Sequence[int],
    group_b_rows: Sequence[int],
    tolerance: float = 0.0,
) -> FairnessMatchingInputArgs:
    """Extend a matching problem with the two fairness rows (b' = (b, δ, δ))."""
    b_ext = np.concatenate(
        [np.asarray(input_args.b_vec), np.float32([tolerance, tolerance])]
    ).astype(np.float32)
    return FairnessMatchingInputArgs(
        A=input_args.A,
        c=input_args.c,
        projection_map=input_args.projection_map,
        b_vec=b_ext,
        equality_mask=None,
        group_a_rows=tuple(int(r) for r in group_a_rows),
        group_b_rows=tuple(int(r) for r in group_b_rows),
    )


def _register_fairness_objective():
    """Plug the demo objective into ``run_solver`` via the registry
    (``dualip_tpu.register_objective``) under ``objective_type=
    "movielens_fairness"`` — the operator-centric extension path."""
    from dualip_tpu import register_objective
    from dualip_tpu.run_solver import _OBJECTIVE_REGISTRY

    if "movielens_fairness" in _OBJECTIVE_REGISTRY:
        return

    @register_objective("movielens_fairness")
    def _factory(input_args, solver_args=None, compute_args=None, mesh=None, **kw):
        if mesh is not None:
            raise NotImplementedError("the fairness demo is single-mesh")
        return FairnessMatchingObjective(input_args, gamma=solver_args.gamma, **kw)


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

    objective_type = "matching"
    if args.fairness_group_a and args.fairness_group_b:
        ga = [int(x) for x in args.fairness_group_a.split(",")]
        gb = [int(x) for x in args.fairness_group_b.split(",")]
        input_args = make_fairness_input_args(input_args, ga, gb, args.fairness_tolerance)
        _register_fairness_objective()
        objective_type = "movielens_fairness"
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
            objective_args=ObjectiveArgs(objective_type=objective_type),
        )
        print("Dual objective:", result.dual_objective)


if __name__ == "__main__":
    main()
