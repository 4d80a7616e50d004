"""Benchmark helpers (parity: reference ``benchmark/benchmark_utils.py``)."""

from __future__ import annotations

import csv
import json
import time
from pathlib import Path
from typing import Optional

import numpy as np

from generate_synthetic_data import generate_synthetic_matching_input_args


def generate_benchmark_data(
    num_sources: int,
    num_destinations: int,
    target_sparsity: float,
    seed: int = 42,
    use_preconditioning: bool = False,
    validate: bool = False,
):
    """Generate (and optionally precondition/validate) the benchmark LP
    (reference ``benchmark_utils.py:14-58``)."""
    args = generate_synthetic_matching_input_args(
        num_sources, num_destinations, target_sparsity, seed=seed
    )
    row_norms = None
    if validate:
        from dualip_tpu.preprocessing import run_all_checks

        run_all_checks(args.A)
    if use_preconditioning:
        from dualip_tpu.preprocessing import jacobi_precondition

        A2, b2, row_norms = jacobi_precondition(args.A, np.asarray(args.b_vec))
        args = type(args)(
            A=A2, c=args.c, projection_map=args.projection_map, b_vec=b2, equality_mask=args.equality_mask
        )
    return args, row_norms


def results_filename(prefix: str, num_sources, num_destinations, sparsity, max_iter, n_devices=1, ext="csv") -> str:
    """Informative result filename (reference ``benchmark_utils.py:61-98``)."""
    ts = time.strftime("%Y%m%d_%H%M%S")
    return (
        f"{prefix}_s{num_sources}_d{num_destinations}_sp{sparsity}"
        f"_it{max_iter}_dev{n_devices}_{ts}.{ext}"
    )


def print_config(cfg: dict) -> None:
    print("=" * 60)
    for k, v in cfg.items():
        print(f"  {k}: {v}")
    print("=" * 60)


def print_results(solve_s: float, max_iter: int, result, nnz: int) -> None:
    """Result summary incl. ms/iter (reference ``benchmark_utils.py:101-180``)."""
    print("-" * 60)
    print(f"  solve time:     {solve_s:.2f} s")
    print(f"  ms/iter:        {solve_s / max_iter * 1000:.3f}")
    print(f"  nnz:            {nnz}")
    print(f"  dual objective: {result.dual_objective}")
    if result.objective_result.max_pos_slack is not None:
        print(f"  max_pos_slack:  {float(np.asarray(result.objective_result.max_pos_slack))}")
        print(f"  sum_pos_slack:  {float(np.asarray(result.objective_result.sum_pos_slack))}")
    print("-" * 60)


def save_dual_curve(path: str, dual_objective_log) -> None:
    """Per-iteration dual-objective CSV (reference ``benchmark_utils.py:183-196``)."""
    with open(path, "w", newline="") as fh:
        writer = csv.writer(fh)
        writer.writerow(["iteration", "dual_objective"])
        for i, v in enumerate(dual_objective_log, start=1):
            writer.writerow([i, v])


def save_metrics_json(path: str, metrics: dict) -> None:
    Path(path).write_text(json.dumps(metrics, indent=2))
