"""Mesh-sharded matching benchmark (parity: reference
``benchmark/run_matching_benchmark_dist.py``).

The reference launched one process per GPU under torchrun, scattered pickled
shards, and reduced over NCCL (``run_matching_benchmark_dist.py:33-193``).
The TPU equivalent is a single SPMD program: a 1-D entity mesh over
``--num-devices`` chips, tiles sharded along the entity axis, one all-reduce
per iteration.  Runs on real chips or on virtual CPU devices
(``--platform cpu --num-devices 8`` uses the host-platform device trick that
replaces torchrun for CI, SURVEY.md §4).

Multi-host pods: launch this same script once per host (JAX distributed
initialization via ``dualip_tpu.parallel.initialize_multihost``); the mesh
spans all processes' devices.
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
    p.add_argument("--layout", default="csc", choices=["csc", "butterfly"],
                   help="gradient formulation (butterfly = fast path, per-shard plans)")
    p.add_argument("--num-devices", type=int, default=None, help="default: all visible devices")
    p.add_argument("--platform", default=None, help="cpu -> virtual host devices")
    p.add_argument("--coordinator", default=None, help="multi-host coordinator address")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu" and args.num_devices:
            jax.config.update("jax_num_cpu_devices", args.num_devices)

    from dualip_tpu.parallel import default_mesh, initialize_multihost

    if args.coordinator:
        initialize_multihost(args.coordinator)

    import jax.numpy as jnp

    from benchmark_utils import generate_benchmark_data, print_config, print_results
    from dualip_tpu.objectives.matching import MatchingSolverDualObjectiveFunction
    from dualip_tpu.optimizers.agd import AcceleratedGradientDescent

    mesh = default_mesh(args.num_devices)
    n_dev = int(mesh.devices.size)
    print_config({**vars(args), "mesh_devices": n_dev})

    t0 = time.perf_counter()
    input_args, _ = generate_benchmark_data(
        args.num_sources, args.num_destinations, args.target_sparsity, seed=args.seed
    )
    print(f"data: {time.perf_counter()-t0:.1f}s nnz={input_args.A.nnz}")

    t0 = time.perf_counter()
    objective = MatchingSolverDualObjectiveFunction(
        input_args, gamma=args.gamma, mesh=mesh, keep_flat_idx=False, layout=args.layout
    )
    print(f"sharded tiles: {time.perf_counter()-t0:.1f}s over {n_dev} devices")

    solver = AcceleratedGradientDescent(
        max_iter=args.max_iter,
        gamma=args.gamma,
        initial_step_size=args.initial_step_size,
        max_step_size=args.max_step_size,
    )
    lam0 = jnp.zeros(args.num_destinations, jnp.float32)
    t0 = time.perf_counter()
    result = solver.maximize(objective, lam0)
    solve_s = time.perf_counter() - t0
    print_results(solve_s, args.max_iter, result, input_args.A.nnz)


if __name__ == "__main__":
    main()
