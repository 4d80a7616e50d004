"""Solve the LP relaxation of a MIPLIB 2017 instance.

Parity: reference ``examples/miplib_2017/solve_miplib_dataset.py`` — loads the
bundled ``v150d30-2hopcds`` instance (public MIPLIB 2017 data), runs 10,000
AGD iterations at γ=1e-3, and checks the dual objective lands at ≈27±1
(reference ``solve_miplib_dataset.py:42-71``).

Usage:
    python solve_miplib_dataset.py [--mps-path PATH] [--max-iter N] [--platform cpu|tpu]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--mps-path",
        default=str(Path(__file__).parent / "v150d30-2hopcds.mps.gz"),
    )
    parser.add_argument("--max-iter", type=int, default=10000)
    parser.add_argument("--initial-step-size", type=float, default=1e-5)
    parser.add_argument("--gamma", type=float, default=1e-3)
    parser.add_argument("--platform", default=None, help="cpu | tpu (default: ambient)")
    parser.add_argument(
        "--num-devices", type=int, default=1,
        help="mesh devices for the sharded general-LP path (sparse A shards by nnz)",
    )
    parser.add_argument("--expected-dual", type=float, default=27.0)
    parser.add_argument("--tolerance", type=float, default=1.0)
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.platform == "cpu" and args.num_devices > 1:
        jax.config.update("jax_num_cpu_devices", args.num_devices)

    import jax.numpy as jnp

    from dualip_tpu import ComputeArgs, ObjectiveArgs, SolverArgs, run_solver
    from dualip_tpu.io.mps import read_mps_file

    t0 = time.perf_counter()
    lp = read_mps_file(args.mps_path, verbose=True)
    print(f"parsed in {time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    result = run_solver(
        input_args=lp.to_miplib_input_args(),
        solver_args=SolverArgs(
            max_iter=args.max_iter,
            initial_step_size=args.initial_step_size,
            gamma=args.gamma,
        ),
        compute_args=ComputeArgs(
            host_device=args.platform or "cpu", compute_device_num=args.num_devices
        ),
        objective_args=ObjectiveArgs(objective_type="miplib2017"),
    )
    print(f"solved in {time.perf_counter() - t0:.1f}s")
    print(f"dual objective: {result.dual_objective:.4f}")

    err = abs(result.dual_objective - args.expected_dual)
    if err > args.tolerance:
        print(f"FAIL: |{result.dual_objective:.4f} - {args.expected_dual}| = {err:.4f} > {args.tolerance}")
        return 1
    print(f"OK: within {args.tolerance} of expected {args.expected_dual}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
