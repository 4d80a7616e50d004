"""Canonical-scale benchmark: the reference's full 25M-source × 10K-dest
matching workload (~250M nnz; reference ``benchmark/config.py:9-19``) run
end-to-end on one TPU chip.

Two phases, both resumable through disk caches:

1. ``--host-build``: cold ingestion on CPU — native O(E) generation,
   BlockCSC tiling, butterfly routing — leaving the generator cache
   (memmap tier) and the Beneš plan cache on disk.  Phase timings and RSS
   are the "cold build" artifact (``benchmark/calibrate_host_pipeline.py``
   prints the same breakdown at any size).
2. ``--tpu-run``: fresh-process solves on the TPU via ``bench.py``'s child
   protocol (one solve per process, fetch-terminated, warm caches), at a
   small and a large iteration count; reports per-iteration time as
   min(pair slope, big-run t/n) plus dual objective and HBM high-water.

Results append to ``benchmark/results/canonical_250m.json``.

Honest-measurement caveats are bench.py's: the TPU pool is shared and
tunneled, so treat any single run as an upper bound on hardware cost.
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

RESULTS = HERE / "results" / "canonical_250m.json"

# Canonical shape (env overrides exist only for smoke-testing the plumbing)
NUM_SOURCES = int(os.environ.get("DUALIP_CANON_SOURCES", 25_000_000))
NUM_DESTS = int(os.environ.get("DUALIP_CANON_DESTS", 10_000))
SPARSITY = 1e-3
SEED = 42


def _append_result(entry: dict) -> None:
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    data = json.loads(RESULTS.read_text()) if RESULTS.exists() else []
    data.append(entry)
    RESULTS.write_text(json.dumps(data, indent=1))


def host_build() -> None:
    os.environ.setdefault("DUALIP_GEN_BACKEND", "native")
    import subprocess

    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, str(HERE / "calibrate_host_pipeline.py"), str(NUM_SOURCES)],
        capture_output=True,
        text=True,
    )
    wall = round(time.perf_counter() - t0, 1)
    line = next(
        (l for l in out.stdout.splitlines() if l.startswith("{")), None
    )
    if line is None:
        print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
        raise SystemExit("host build failed")
    entry = {"phase": "host_build", "wall_s": wall, **json.loads(line)}
    _append_result(entry)
    print(json.dumps(entry))


def prime_tile_cache(write_marker: bool = False) -> None:
    """CPU build that writes the device-ready layout cache (tile_cache.py)
    under the exact key the TPU bench children look up — after this, a warm
    child's build phase is pure IO (panel/row arrays mmap-loaded + one H2D
    staging) instead of 290-390 s of tile fill + argsort + transposes.

    ``write_marker`` additionally drops ``CANONICAL.json`` into the tile-cache
    dir: bench.py auto-detects it and runs the flagship 25M×10K workload
    through the driver protocol (the driver-captured canonical number,
    VERDICT r3 #1).  The marker records the layout env so the bench children
    reproduce the primed configuration exactly."""
    os.environ.setdefault("DUALIP_GEN_BACKEND", "native")
    # flagship configuration: compact butterfly packing + bf16 carry
    # (carry dtype is runtime-only; compact affects the cache key)
    os.environ.setdefault("DUALIP_BENCH_COMPACT", "1")
    import subprocess

    code = (
        "import os, sys, time, json\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.path.insert(0, {str(HERE.parent)!r}); sys.path.insert(0, {str(HERE)!r})\n"
        "import bench\n"
        "from generate_synthetic_data import generate_synthetic_matching_input_args\n"
        f"ns, nd, sp, seed = {NUM_SOURCES}, {NUM_DESTS}, {SPARSITY}, {SEED}\n"
        "t0 = time.perf_counter()\n"
        "args = generate_synthetic_matching_input_args(ns, nd, sp, seed=seed)\n"
        "gen_s = time.perf_counter() - t0\n"
        "t0 = time.perf_counter()\n"
        "obj = bench.build_bench_objective(args, ns, nd, sp, seed, layout='butterfly')\n"
        "print(json.dumps({'gen_s': round(gen_s, 1),"
        " 'build_and_save_s': round(time.perf_counter() - t0, 1),"
        " 'cache_key': getattr(obj, 'tile_cache_key', None)}))\n"
    )
    t0 = time.perf_counter()
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    line = next((l for l in out.stdout.splitlines() if l.startswith("{")), None)
    if line is None:
        print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
        raise SystemExit("tile-cache prime failed")
    payload = json.loads(line)
    entry = {
        "phase": "prime_tile_cache",
        "wall_s": round(time.perf_counter() - t0, 1),
        "num_sources": NUM_SOURCES,
        **payload,
    }
    _append_result(entry)
    print(json.dumps(entry))
    if write_marker:
        if not payload.get("cache_key"):
            raise SystemExit("prime completed but no cache key was recorded")
        cache_dir = Path(
            os.environ.get(
                "DUALIP_BENCH_TILE_CACHE", str(HERE.parent / "benchmark_data" / "tile_cache")
            )
        )
        marker = {
            "num_sources": NUM_SOURCES,
            "num_dests": NUM_DESTS,
            "sparsity": SPARSITY,
            "seed": SEED,
            "cache_key": payload["cache_key"],
            "env": {
                "DUALIP_GEN_BACKEND": os.environ.get("DUALIP_GEN_BACKEND", "native"),
                "DUALIP_BENCH_COMPACT": os.environ.get("DUALIP_BENCH_COMPACT", "1"),
                "DUALIP_BENCH_CARRY_DTYPE": os.environ.get(
                    "DUALIP_BENCH_CARRY_DTYPE", "bfloat16"
                ),
                "DUALIP_BENCH_LAUNCH_CHUNK": os.environ.get(
                    "DUALIP_BENCH_LAUNCH_CHUNK", "100"
                ),
            },
        }
        (cache_dir / "CANONICAL.json").write_text(json.dumps(marker, indent=1))
        print(f"# canonical marker written: {cache_dir / 'CANONICAL.json'}", file=sys.stderr)


def tpu_run(n_small: int, n_big: int, child_timeout: int) -> None:
    os.environ.setdefault("DUALIP_GEN_BACKEND", "native")
    os.environ.setdefault("DUALIP_BENCH_CACHE", str(HERE.parent / "benchmark_data"))
    os.environ.setdefault(
        "DUALIP_BENCH_PLAN_CACHE", str(HERE.parent / "benchmark_data" / "plan_cache")
    )
    import bench

    entry = {
        "phase": "tpu_run",
        "num_sources": NUM_SOURCES,
        "carry_dtype": os.environ.get("DUALIP_BENCH_CARRY_DTYPE", "float32"),
        "compact": os.environ.get("DUALIP_BENCH_COMPACT") == "1",
        "launch_chunk": int(os.environ.get("DUALIP_BENCH_LAUNCH_CHUNK", "0")),
        "children": [],
    }
    r_small = bench._run_child(NUM_SOURCES, NUM_DESTS, SPARSITY, n_small, SEED, child_timeout)
    if r_small:
        entry["children"].append(r_small)
        print(f"# small ({n_small} iters): {r_small}", file=sys.stderr)
        # size the big run so solve time stays inside the child timeout even
        # if the pool stays at the rate the small run just saw
        rate = r_small["solve_s"] / n_small
        overhead = r_small["gen_s"] + r_small["build_s"] + 180
        n_big = min(n_big, max(2 * n_small, int((0.7 * child_timeout - overhead) / rate)))
        n_big -= n_big % 100
    r_big = (
        bench._run_child(NUM_SOURCES, NUM_DESTS, SPARSITY, n_big, SEED, child_timeout)
        if n_big > n_small
        else None
    )
    if r_big:
        entry["children"].append(r_big)
        print(f"# big ({n_big} iters): {r_big}", file=sys.stderr)
    candidates = []
    if r_small and r_big:
        slope = (r_big["solve_s"] - r_small["solve_s"]) / (r_big["iters"] - r_small["iters"])
        if slope > 0:
            candidates.append(slope)
    if r_big:
        candidates.append(r_big["solve_s"] / r_big["iters"])
    elif r_small:
        candidates.append(r_small["solve_s"] / r_small["iters"])
    if not candidates:
        raise SystemExit("no TPU child completed")
    entry["ms_per_iter"] = round(min(candidates) * 1000, 2)
    ref = r_big or r_small
    entry["nnz"] = ref["nnz"]
    entry["dual_objective"] = ref["dual_objective"]
    if "hbm_peak_gb" in ref:
        entry["hbm_peak_gb"] = ref["hbm_peak_gb"]
    _append_result(entry)
    print(json.dumps(entry))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host-build", action="store_true")
    ap.add_argument("--prime-tile-cache", action="store_true")
    ap.add_argument(
        "--write-marker",
        action="store_true",
        help="after priming, write CANONICAL.json so bench.py runs the flagship workload",
    )
    ap.add_argument("--tpu-run", action="store_true")
    ap.add_argument("--iters-small", type=int, default=200)
    ap.add_argument("--iters-big", type=int, default=1000)
    ap.add_argument("--child-timeout", type=int, default=3300)
    args = ap.parse_args()
    if args.host_build:
        host_build()
    if args.prime_tile_cache:
        prime_tile_cache(write_marker=args.write_marker)
    if args.tpu_run:
        tpu_run(args.iters_small, args.iters_big, args.child_timeout)
    if not (args.host_build or args.tpu_run or args.prime_tile_cache):
        ap.error("pass --host-build, --prime-tile-cache and/or --tpu-run")


if __name__ == "__main__":
    main()
