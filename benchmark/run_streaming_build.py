"""Streaming host-build artifact: a ≥1B-nnz device-ready sharded cache at
O(nnz/shards) RSS (VERDICT r3 #7, toward the reference scaling grid's
2.5B-nnz row, ``/root/reference/benchmark/run_scaling_benchmark.py:33-56``).

Phases (each appended to ``benchmark/results/streaming_build.json``):

1. ``gen``    — native O(E) generation into the memmap cache, run in a
   SUBPROCESS so its RSS is recorded separately (one-time data prep; the
   reference's own generator memmaps for the same reason,
   ``generate_synthetic_data.py:202-343``).
2. ``build``  — ``dualip_tpu/io/streaming_build.py``: per-shard tile fill +
   Beneš routing + direct write into the stacked device-ready cache.  Peak
   RSS is sampled from /proc/self/status every 2 s; the round-3 whole-
   problem build was ~170 B/nnz (84 GB at 500M) — the streaming target is
   O(nnz / n_shards).

Usage:  python benchmark/run_streaming_build.py --sources 100000000 --shards 8
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
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


def _append(entry):
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    data = json.loads(RESULTS.read_text()) if RESULTS.exists() else []
    data.append(entry)
    RESULTS.write_text(json.dumps(data, indent=1))
    print(json.dumps(entry))


class RssSampler:
    def __init__(self, period=2.0):
        self.peak_kb = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, args=(period,), daemon=True)

    def _run(self, period):
        while not self._stop.is_set():
            try:
                for line in open("/proc/self/status"):
                    if line.startswith("VmRSS:"):
                        self.peak_kb = max(self.peak_kb, int(line.split()[1]))
                        break
            except OSError:
                pass
            self._stop.wait(period)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sources", type=int, default=100_000_000)
    ap.add_argument("--dests", type=int, default=10_000)
    ap.add_argument("--sparsity", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--cache-dir", default=str(HERE.parent / "benchmark_data"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("DUALIP_GEN_BACKEND", "native")
    os.environ.setdefault("DUALIP_GEN_MEMMAP", "1")

    import numpy as np

    from generate_synthetic_data import _cache_path

    backend = os.environ["DUALIP_GEN_BACKEND"]
    mm_dir = _cache_path(
        args.cache_dir, args.sources, args.dests, args.sparsity, np.float32,
        (args.seed, backend),
    ).with_suffix(".mm")

    # ---- phase 1: generation (subprocess; one-time data prep) -----------
    if not (mm_dir / "b.npy").exists():
        code = (
            "import os, sys, resource, json\n"
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            f"sys.path.insert(0, {str(HERE.parent)!r}); sys.path.insert(0, {str(HERE)!r})\n"
            "from generate_synthetic_data import generate_synthetic_matching_input_args\n"
            f"a = generate_synthetic_matching_input_args({args.sources}, {args.dests},"
            f" {args.sparsity}, seed={args.seed}, cache_dir={args.cache_dir!r})\n"
            "print(json.dumps({'nnz': a.A.nnz,"
            " 'rss_gb': round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20, 2)}))\n"
        )
        t0 = time.perf_counter()
        out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
        line = next((l for l in out.stdout.splitlines() if l.startswith("{")), None)
        if line is None:
            print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
            raise SystemExit("generation failed")
        _append({
            "phase": "gen",
            "backend": backend,
            "num_sources": args.sources,
            "wall_s": round(time.perf_counter() - t0, 1),
            **json.loads(line),
        })

    # ---- phase 2: streaming build ---------------------------------------
    from dualip_tpu.io.streaming_build import stream_build_sharded_cache
    from dualip_tpu.objectives.matching import matching_tile_cache_key
    from dualip_tpu.projections import create_projection_map
    from dualip_tpu.sparse.csc import CSCMatrix

    rows = np.load(mm_dir / "rows.npy", mmap_mode="r")
    ccol = np.load(mm_dir / "ccol.npy", mmap_mode="r")
    nnz = int(rows.shape[0])
    pm = create_projection_map("simplex", {"z": 1.0}, args.sources)
    # key: identical to what a mesh solve of this problem will compute
    # (explicit generator identity — hashing 1B-nnz content costs minutes)
    explicit = (
        f"bench_{args.sources}x{args.dests}_{args.sparsity}_{args.seed}_"
        f"{backend}_{nnz}"
    )
    shim = type("A", (), {})()  # explicit key path: content arrays unused
    shim.A = CSCMatrix(
        indptr=np.zeros(1, np.int64), row_indices=np.zeros(0, np.int32),
        data=np.zeros(0, np.float32), shape=(args.dests, args.sources),
    )
    shim.c = shim.A
    shim.projection_map = pm
    key = matching_tile_cache_key(
        shim, n_shards=args.shards, compact=True, tile_cache_key=explicit
    )

    t0 = time.perf_counter()
    with RssSampler() as rss:
        out_dir = stream_build_sharded_cache(
            mm_dir,
            shape=(args.dests, args.sources),
            projection_map=pm,
            n_shards=args.shards,
            cache_dir=Path(args.cache_dir) / "tile_cache",
            key=key,
            plan_cache_dir=Path(args.cache_dir) / "plan_cache",
            compact=True,
            progress=lambda s: print(f"# {s}", file=sys.stderr),
        )
    _append({
        "phase": "build",
        "num_sources": args.sources,
        "n_shards": args.shards,
        "nnz": nnz,
        "wall_s": round(time.perf_counter() - t0, 1),
        "rss_peak_gb": round(rss.peak_kb / 2**20, 2),
        "bytes_per_nnz_rss": round(rss.peak_kb * 1024 / max(nnz, 1), 1),
        "cache_entry": str(out_dir),
        "cache_entry_gb": round(
            sum(f.stat().st_size for f in Path(out_dir).glob("*")) / 2**30, 2
        ),
    })


if __name__ == "__main__":
    main()
