"""Compile-time analysis of one butterfly dual-gradient evaluation.

Builds the bench-sized matching objective (butterfly layout), compiles ONE
``calculate_traceable`` for the ambient backend, and prints XLA's
cost/memory analysis plus a census of the optimized HLO (copies, concats,
fusions, custom calls) — the ground truth on how many HBM bytes one
iteration actually moves, independent of pool contention.

Usage: python benchmark/analyze_iteration_hlo.py [num_sources]
"""

from __future__ import annotations

import collections
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    num_sources = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    carry_dtype = sys.argv[2] if len(sys.argv) > 2 else None  # e.g. bfloat16
    tile_dtype = sys.argv[3] if len(sys.argv) > 3 else "float32"

    import os

    import jax
    import jax.numpy as jnp

    from generate_synthetic_data import generate_synthetic_matching_input_args

    if carry_dtype:
        os.environ["DUALIP_BENCH_CARRY_DTYPE"] = carry_dtype
    if tile_dtype == "bfloat16":
        os.environ["DUALIP_BENCH_TILE_DTYPE"] = "bfloat16"
    args = generate_synthetic_matching_input_args(num_sources, 10_000, 1e-3, seed=42)
    print(f"nnz={args.A.nnz} carry_dtype={carry_dtype} tile_dtype={tile_dtype}")
    # The exact bench-child construction (same layout defaults, plan cache,
    # and device-ready tile cache), so warm analyses stage instead of
    # rebuilding at canonical scale.
    import bench

    obj = bench.build_bench_objective(args, num_sources, 10_000, 1e-3, 42)

    fn = jax.jit(lambda p, dv, gg: obj.calculate_traceable(p, dv, gg))
    lowered = fn.lower(obj.params, jnp.zeros(10_000, jnp.float32), jnp.asarray(1e-3))
    compiled = lowered.compile()

    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    keys = ["bytes accessed", "flops", "transcendentals", "optimal_seconds"]
    print("--- cost analysis ---")
    for k in keys:
        if ca and k in ca:
            print(f"{k}: {ca[k]:.4g}")
    if ca:
        # per-memory-space breakdown if present
        for k, v in sorted(ca.items()):
            if k.startswith("bytes accessed") and k != "bytes accessed":
                print(f"{k}: {v:.4g}")

    ma = compiled.memory_analysis()
    if ma is not None:
        for attr in (
            "temp_size_in_bytes",
            "argument_size_in_bytes",
            "output_size_in_bytes",
            "peak_memory_in_bytes",
        ):
            if hasattr(ma, attr):
                print(f"{attr}: {getattr(ma, attr):,}")

    print("--- HLO census (optimized) ---")
    txt = compiled.as_text()
    ops = collections.Counter()
    big = []
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = (\w+)\[([\d,]*)\]", line)
        if not m:
            m2 = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = \(?(\w+)", line)
            continue
        shape, op = m.group(2), None
        m3 = re.search(r"\]\{?[\w,: ]*\}? (\w+)\(", line)
        if m3:
            op = m3.group(1)
        if not op:
            continue
        ops[op] += 1
        dims = [int(d) for d in shape.split(",") if d]
        import math

        n_el = math.prod(dims) if dims else 1
        if op in ("copy", "concatenate", "transpose", "gather", "scatter", "sort") and n_el > 1_000_000:
            big.append((op, n_el, line.strip()[:140]))
    for op, cnt in ops.most_common(25):
        print(f"{op:>18}: {cnt}")
    print("--- large data-movement ops (>1M elements) ---")
    for op, n_el, line in sorted(big, key=lambda t: -t[1])[:30]:
        print(f"{op} {n_el:,}: {line}")


if __name__ == "__main__":
    main()
