"""Measure the reference PyTorch DuaLip implementation on this machine.

Produces ``benchmark/baselines.json`` consumed by ``bench.py``'s
``vs_baseline``.  The reference publishes no absolute numbers (BASELINE.md),
and this machine has no CUDA GPU, so the baseline is the reference running
on CPU torch over the identical synthetic workload (same generator arrays).

Requires the reference checkout (default ``/root/reference``; override with
``DUALIP_REFERENCE_PATH``).  The reference imports ``mlflow`` unconditionally
(``utils/mlflow_utils.py:5``); a no-op stub is injected when it is absent.

    python benchmark/measure_torch_baseline.py [--num-sources N] [--iters N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))
sys.path.insert(0, str(HERE))


from reference_loader import inject_mlflow_stub as _inject_mlflow_stub  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-sources", type=int, default=2_500_000)
    p.add_argument("--num-destinations", type=int, default=10_000)
    p.add_argument("--target-sparsity", type=float, default=1e-3)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--reference-path", default=os.environ.get("DUALIP_REFERENCE_PATH", "/root/reference"))
    p.add_argument("--out", default=str(HERE / "baselines.json"))
    args = p.parse_args()

    ref_src = Path(args.reference_path) / "src"
    if not ref_src.exists():
        raise SystemExit(f"reference not found at {args.reference_path}")
    sys.path.insert(0, str(ref_src))
    _inject_mlflow_stub()

    import torch

    from dualip.objectives.matching import (  # reference import, not a copy
        MatchingInputArgs as RefMatchingInputArgs,
        MatchingSolverDualObjectiveFunction as RefMatching,
    )
    from generate_synthetic_data import generate_synthetic_matching_input_args

    t0 = time.perf_counter()
    inp = generate_synthetic_matching_input_args(
        args.num_sources, args.num_destinations, args.target_sparsity, seed=args.seed
    )
    nnz = inp.A.nnz
    print(f"data: {time.perf_counter()-t0:.1f}s nnz={nnz}")

    A_t = torch.sparse_csc_tensor(
        torch.from_numpy(inp.A.indptr),
        torch.from_numpy(inp.A.row_indices.astype(np.int64)),
        torch.from_numpy(inp.A.data),
        size=inp.A.shape,
    )
    C_t = torch.sparse_csc_tensor(
        torch.from_numpy(inp.c.indptr),
        torch.from_numpy(inp.c.row_indices.astype(np.int64)),
        torch.from_numpy(inp.c.data),
        size=inp.c.shape,
    )
    b_t = torch.from_numpy(np.asarray(inp.b_vec))

    ref_args = RefMatchingInputArgs(
        A=A_t, c=C_t, projection_map=inp.projection_map, b_vec=b_t, equality_mask=None
    )
    t0 = time.perf_counter()
    objective = RefMatching(matching_input_args=ref_args, gamma=1e-3, batching=True)
    print(f"reference objective build: {time.perf_counter()-t0:.1f}s")

    lam = torch.zeros(args.num_destinations)
    for _ in range(args.warmup):
        res = objective.calculate(lam, gamma=1e-3)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        res = objective.calculate(lam, gamma=1e-3)
    per_iter = (time.perf_counter() - t0) / args.iters
    print(f"reference torch CPU: {per_iter*1000:.1f} ms/iter ({1/per_iter:.2f} it/s) at nnz={nnz}")

    out = {}
    out_path = Path(args.out)
    if out_path.exists():
        out = json.loads(out_path.read_text())
    out["torch_cpu_matching"] = {
        "iters_per_sec": 1.0 / per_iter,
        "ms_per_iter": per_iter * 1000,
        "nnz": nnz,
        "num_sources": args.num_sources,
        "num_destinations": args.num_destinations,
        "target_sparsity": args.target_sparsity,
        "device": "cpu",
        "torch_threads": torch.get_num_threads(),
        "note": (
            "reference implementation, objective.calculate() per-iteration cost on CPU "
            "(no CUDA GPU on this machine; optimizer overhead excluded - it is negligible "
            "at this nnz). vs_baseline scales this by nnz ratio."
        ),
    }
    out_path.write_text(json.dumps(out, indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
