"""Single-chip matching benchmark (parity: reference
``benchmark/run_matching_benchmark.py``).

Builds the canonical synthetic matching LP, times the AGD solve, prints
ms/iter and dumps the dual-objective curve + metrics JSON.  Supports the
reference's γ-decay mode (``initial_gamma = final_gamma / decay_factor**n``,
reference ``run_matching_benchmark.py:33-38``).

    python run_matching_benchmark.py [--num-sources N] [--max-iter N]
        [--use-gamma-decay] [--platform cpu|tpu] [--out-dir DIR]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import config as CONFIG  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-sources", type=int, default=CONFIG.NUM_SOURCES)
    p.add_argument("--num-destinations", type=int, default=CONFIG.NUM_DESTINATIONS)
    p.add_argument("--target-sparsity", type=float, default=CONFIG.TARGET_SPARSITY)
    p.add_argument("--max-iter", type=int, default=CONFIG.MAX_ITER)
    p.add_argument("--gamma", type=float, default=CONFIG.GAMMA)
    p.add_argument("--initial-step-size", type=float, default=CONFIG.INITIAL_STEP_SIZE)
    p.add_argument("--max-step-size", type=float, default=CONFIG.MAX_STEP_SIZE)
    p.add_argument("--seed", type=int, default=CONFIG.SEED)
    p.add_argument("--use-preconditioning", action="store_true", default=CONFIG.USE_PRECONDITIONING)
    p.add_argument("--no-batching", action="store_true")
    p.add_argument("--use-pallas", action="store_true", help="fused Pallas tile kernel")
    p.add_argument("--layout", default="csc", choices=["csc", "row", "butterfly"],
                   help="gradient formulation (butterfly = fast TPU path)")
    p.add_argument("--pallas-block-k", type=int, default=1024)
    p.add_argument("--use-gamma-decay", action="store_true")
    p.add_argument("--decay-factor", type=float, default=0.5)
    p.add_argument("--decay-steps", type=int, default=100)
    p.add_argument("--platform", default=None)
    p.add_argument("--out-dir", default=None)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from benchmark_utils import (
        generate_benchmark_data,
        print_config,
        print_results,
        results_filename,
        save_dual_curve,
        save_metrics_json,
    )
    from dualip_tpu.objectives.matching import MatchingSolverDualObjectiveFunction
    from dualip_tpu.optimizers.agd import AcceleratedGradientDescent

    gamma = args.gamma
    gamma_decay_type = None
    gamma_decay_params = None
    if args.use_gamma_decay:
        num_decays = args.max_iter // args.decay_steps
        gamma = args.gamma / (args.decay_factor**num_decays)  # reference :33-38
        gamma_decay_type = "step"
        gamma_decay_params = {"decay_steps": args.decay_steps, "decay_factor": args.decay_factor}

    print_config(vars(args))

    t0 = time.perf_counter()
    input_args, _ = generate_benchmark_data(
        args.num_sources,
        args.num_destinations,
        args.target_sparsity,
        seed=args.seed,
        use_preconditioning=args.use_preconditioning,
    )
    print(f"data: {time.perf_counter()-t0:.1f}s nnz={input_args.A.nnz}")

    t0 = time.perf_counter()
    objective = MatchingSolverDualObjectiveFunction(
        input_args,
        gamma=gamma,
        batching=not args.no_batching,
        keep_flat_idx=False,
        use_pallas=args.use_pallas,
        pallas_block_k=args.pallas_block_k,
        layout=args.layout,
    )
    print(f"tiles: {time.perf_counter()-t0:.1f}s ({len(objective.bcsc.tiles)} tiles)")

    solver = AcceleratedGradientDescent(
        max_iter=args.max_iter,
        gamma=gamma,
        initial_step_size=args.initial_step_size,
        max_step_size=args.max_step_size,
        gamma_decay_type=gamma_decay_type,
        gamma_decay_params=gamma_decay_params,
    )
    lam0 = jnp.zeros(args.num_destinations, jnp.float32)
    t0 = time.perf_counter()
    result = solver.maximize(objective, lam0)
    solve_s = time.perf_counter() - t0

    print_results(solve_s, args.max_iter, result, input_args.A.nnz)

    if args.out_dir:
        out = Path(args.out_dir)
        out.mkdir(parents=True, exist_ok=True)
        curve = out / results_filename(
            "dual_curve", args.num_sources, args.num_destinations, args.target_sparsity, args.max_iter
        )
        save_dual_curve(str(curve), result.dual_objective_log)
        metrics = out / results_filename(
            "metrics", args.num_sources, args.num_destinations, args.target_sparsity, args.max_iter, ext="json"
        )
        save_metrics_json(
            str(metrics),
            {
                "solve_time_s": solve_s,
                "ms_per_iter": solve_s / args.max_iter * 1000,
                "dual_objective": result.dual_objective,
                "nnz": input_args.A.nnz,
                "config": {k: v for k, v in vars(args).items()},
            },
        )
        print(f"saved {curve} and {metrics}")


if __name__ == "__main__":
    main()
