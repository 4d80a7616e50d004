"""Scaling sweep: problem sizes × device counts (parity: reference
``benchmark/run_scaling_benchmark.py``).

Sweeps ``--source-sizes`` × ``--device-counts`` via subprocess (one fresh
process per cell, as the reference did via torchrun), accumulates a CSV of
(num_devices, num_sources, nnz, solve_time_s, ms_per_iter, dual_objective)
and doubles as a cross-device-count correctness check: dual objectives at a
given size must agree across device counts (reference
``run_scaling_benchmark.py:5-7``).
"""

from __future__ import annotations

import argparse
import csv
import json
import subprocess
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent


def run_cell(num_sources, num_destinations, sparsity, max_iter, n_devices, platform, seed, layout="csc"):
    code = f"""
import json, time, sys
sys.path.insert(0, {str(HERE.parent)!r}); sys.path.insert(0, {str(HERE)!r})
import jax
platform = {platform!r}
if platform:
    jax.config.update("jax_platforms", platform)
    if platform == "cpu":
        jax.config.update("jax_num_cpu_devices", {n_devices})
import jax.numpy as jnp
from benchmark_utils import generate_benchmark_data
from dualip_tpu.objectives.matching import MatchingSolverDualObjectiveFunction
from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
from dualip_tpu.parallel import default_mesh

args, _ = generate_benchmark_data({num_sources}, {num_destinations}, {sparsity}, seed={seed})
mesh = default_mesh({n_devices}) if {n_devices} > 1 else None
obj = MatchingSolverDualObjectiveFunction(args, gamma=1e-3, mesh=mesh, keep_flat_idx=False, layout={layout!r})
solver = AcceleratedGradientDescent(max_iter={max_iter}, gamma=1e-3,
                                    initial_step_size=1e-3, max_step_size=1e-1)
lam0 = jnp.zeros({num_destinations}, jnp.float32)
t0 = time.perf_counter()
res = solver.maximize(obj, lam0)
solve_s = time.perf_counter() - t0
print("CELL_RESULT " + json.dumps(dict(
    solve_s=solve_s, dual_objective=res.dual_objective, nnz=args.A.nnz,
    max_pos_slack=float(res.objective_result.max_pos_slack),
    sum_pos_slack=float(res.objective_result.sum_pos_slack))))
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("CELL_RESULT "):
            return json.loads(line[len("CELL_RESULT ") :])
    raise RuntimeError(f"cell failed:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source-sizes", type=str, default="25000000,50000000,100000000")
    p.add_argument("--device-counts", type=str, default="1")
    p.add_argument("--num-destinations", type=int, default=10_000)
    p.add_argument("--target-sparsity", type=float, default=1e-3)
    p.add_argument("--max-iter", type=int, default=1000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--platform", default=None)
    p.add_argument("--layout", default="csc", choices=["csc", "butterfly"],
                   help="gradient formulation (butterfly = fast path; composes with the mesh)")
    p.add_argument("--out-csv", default="scaling_results.csv")
    p.add_argument("--check-tolerance", type=float, default=1e-3, help="relative dual-objective agreement across device counts")
    args = p.parse_args()

    sizes = [int(s) for s in args.source_sizes.split(",")]
    devs = [int(d) for d in args.device_counts.split(",")]

    rows = []
    for ns in sizes:
        cell_objs = {}
        for nd in devs:
            print(f"--- sources={ns} devices={nd} ---", flush=True)
            r = run_cell(ns, args.num_destinations, args.target_sparsity, args.max_iter, nd, args.platform, args.seed, layout=args.layout)
            rows.append(
                dict(
                    num_devices=nd,
                    num_sources=ns,
                    nnz=r["nnz"],
                    solve_time_s=round(r["solve_s"], 2),
                    ms_per_iter=round(r["solve_s"] / args.max_iter * 1000, 3),
                    dual_objective=r["dual_objective"],
                    max_pos_slack=r["max_pos_slack"],
                    sum_pos_slack=r["sum_pos_slack"],
                )
            )
            cell_objs[nd] = r["dual_objective"]
            print(rows[-1], flush=True)
        # correctness across device counts (reference's implicit check)
        objs = list(cell_objs.values())
        if len(objs) > 1:
            rel = max(abs(o - objs[0]) / (1 + abs(objs[0])) for o in objs)
            status = "OK" if rel < args.check_tolerance else "MISMATCH"
            print(f"cross-device dual-objective agreement at {ns}: rel={rel:.2e} [{status}]")

    with open(args.out_csv, "w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    print(f"wrote {args.out_csv} ({len(rows)} cells)")


if __name__ == "__main__":
    main()
