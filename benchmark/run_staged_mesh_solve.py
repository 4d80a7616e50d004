"""Stage a published sharded tile-cache entry on a virtual CPU mesh and run a
few solver iterations through the sharded butterfly path (VERDICT r4 #5: the
billion-nnz cache must be shown to SERVE a solve, not just exist).

The staging path is exactly what a TPU-pod solve would do: the objective
constructor finds the cache entry under the same key a bench child computes,
mmap-loads the stacked per-shard leaves, and `device_put`s them sharded over
the mesh's leading axis — no tile fill, no routing.  Here the mesh is
``jax.config jax_num_cpu_devices`` virtual CPU devices (the same mechanism as
tests/ and ``__graft_entry__.dryrun_multichip``), so what is measured is the
staging wall + the numeric health of a handful of iterations, NOT device
throughput (2 vCPUs underneath).

Appends a ``staged_mesh_solve`` entry to benchmark/results/streaming_build.json.

Usage: python benchmark/run_staged_mesh_solve.py --sources 100000000 --shards 8 --iters 6
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))
sys.path.insert(0, str(HERE))

# env-overridable so test smokes don't pollute the checked-in artifact
RESULTS = Path(
    os.environ.get(
        "DUALIP_STREAMBUILD_RESULTS", str(HERE / "results" / "streaming_build.json")
    )
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sources", type=int, default=100_000_000)
    ap.add_argument("--dests", type=int, default=10_000)
    ap.add_argument("--sparsity", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--cache-dir", default=str(HERE.parent / "benchmark_data"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.shards)
    os.environ.setdefault("DUALIP_GEN_BACKEND", "native-stream")
    os.environ.setdefault("DUALIP_GEN_MEMMAP", "1")

    import jax.numpy as jnp
    import numpy as np

    from dualip_tpu.objectives.matching import (
        MatchingSolverDualObjectiveFunction,
        matching_tile_cache_key,
    )
    from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
    from dualip_tpu.parallel import default_mesh
    from generate_synthetic_data import generate_synthetic_matching_input_args

    backend = os.environ["DUALIP_GEN_BACKEND"]
    t0 = time.perf_counter()
    in_args = generate_synthetic_matching_input_args(
        args.sources, args.dests, args.sparsity, seed=args.seed,
        cache_dir=args.cache_dir,
    )
    nnz = int(in_args.A.nnz)
    gen_load_s = time.perf_counter() - t0

    explicit = (
        f"bench_{args.sources}x{args.dests}_{args.sparsity}_{args.seed}_"
        f"{backend}_{nnz}"
    )
    key = matching_tile_cache_key(
        in_args, n_shards=args.shards, compact=True, tile_cache_key=explicit
    )
    entry_dir = Path(args.cache_dir) / "tile_cache" / f"butterfly_{key}"
    if not (entry_dir / "meta.json").exists():
        raise SystemExit(f"cache entry not found: {entry_dir} — run run_streaming_build.py first")

    mesh = default_mesh(args.shards)
    t0 = time.perf_counter()
    obj = MatchingSolverDualObjectiveFunction(
        in_args,
        gamma=1e-3,
        mesh=mesh,
        layout="butterfly",
        compact=True,
        keep_flat_idx=False,
        keep_col_tiles=False,
        tile_cache_dir=str(Path(args.cache_dir) / "tile_cache"),
        tile_cache_key=explicit,
        plan_cache_dir=str(Path(args.cache_dir) / "plan_cache"),
    )
    if obj.tile_cache_key != key or obj.row_layout is None:
        raise SystemExit("constructor did not stage from the published cache entry")
    stage_s = time.perf_counter() - t0

    solver = AcceleratedGradientDescent(
        max_iter=args.iters, gamma=1e-3, initial_step_size=1e-3, max_step_size=1e-1
    )
    t0 = time.perf_counter()
    res = solver.maximize(obj, jnp.zeros(args.dests, jnp.float32))
    solve_s = time.perf_counter() - t0
    log = np.asarray(res.dual_objective_log, dtype=np.float64)

    entry = {
        "phase": "staged_mesh_solve",
        "num_sources": args.sources,
        "n_shards": args.shards,
        "nnz": nnz,
        "cache_entry": str(entry_dir),
        "mesh": f"{args.shards}-device virtual CPU (2 vCPUs underneath)",
        "gen_load_s": round(gen_load_s, 1),
        "staging_wall_s": round(stage_s, 1),
        "iters": args.iters,
        "solve_wall_s": round(solve_s, 1),
        "dual_objective_log": [float(x) for x in log],
        "finite": bool(np.isfinite(log).all()),
        "dual_improved": bool(log[-1] > log[0]),
    }
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    data = json.loads(RESULTS.read_text()) if RESULTS.exists() else []
    data.append(entry)
    RESULTS.write_text(json.dumps(data, indent=1))
    print(json.dumps(entry))
    if not entry["finite"]:
        raise SystemExit("non-finite dual objective")


if __name__ == "__main__":
    main()
