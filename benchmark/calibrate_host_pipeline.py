"""Calibrate host-side ingestion cost (generation, tiling, Beneš routing) at
a given size — no TPU involved.  Used to plan the canonical 250M-nnz run
(reference shape ``benchmark/config.py:9-19``).

Usage: python benchmark/calibrate_host_pipeline.py NUM_SOURCES
"""
from __future__ import annotations

import json
import resource
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))
sys.path.insert(0, str(HERE))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    num_sources = int(sys.argv[1]) if len(sys.argv) > 1 else 2_500_000
    num_dests = 10_000
    sparsity = 1e-3
    out = {"num_sources": num_sources}

    from generate_synthetic_data import generate_synthetic_matching_input_args

    t0 = time.perf_counter()
    args = generate_synthetic_matching_input_args(
        num_sources, num_dests, sparsity, seed=42
    )
    out["gen_s"] = round(time.perf_counter() - t0, 1)
    out["nnz"] = int(args.A.nnz)
    out["rss_after_gen_gb"] = round(rss_gb(), 2)
    print(f"# gen done: {out}", flush=True)

    from dualip_tpu.objectives.matching import MatchingSolverDualObjectiveFunction

    import os

    compact = os.environ.get("DUALIP_BENCH_COMPACT") == "1"
    out["compact"] = compact
    cache = HERE.parent / "benchmark_data" / "plan_cache"
    t0 = time.perf_counter()
    obj = MatchingSolverDualObjectiveFunction(
        args,
        gamma=1e-3,
        keep_flat_idx=False,
        layout="butterfly",
        keep_col_tiles=False,
        plan_cache_dir=str(cache),
        compact=compact,
    )
    out["build_s"] = round(time.perf_counter() - t0, 1)
    plan = obj.row_layout.plan
    out["N"] = int(plan.masks.shape[1]) if hasattr(plan, "masks") else int(plan.N)
    slots = sum(int(np.asarray(t.a).size) for t in obj.row_layout.col_tiles_T)
    out["col_slots"] = slots
    out["pad_ratio"] = round(slots / out["nnz"], 3)
    out["rss_peak_gb"] = round(rss_gb(), 2)
    plans = sorted(cache.glob("benes2_*.npz"), key=lambda p: p.stat().st_mtime)
    if plans:
        out["plan_cache_mb"] = round(plans[-1].stat().st_size / 1e6, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
