"""Differential fuzz soak: N random LPs through this rebuild AND the reference.

Extended-depth version of ``tests/test_differential_reference.py`` for manual
soaks: every case solves one randomized matching LP (random shape/density/
gamma/equality rows, optionally gamma decay) with BOTH implementations and
compares the full dual-objective trace; general-LP cases compare gradients
and PDLP certificates at random duals.  Prints a per-case verdict and a
summary; exits nonzero on any mismatch.

    python benchmark/fuzz_differential.py [--cases 50] [--seed 0] [--iters 30]

Requires the reference checkout (``/root/reference`` or
``DUALIP_REFERENCE_PATH``) and CPU torch; runs JAX on CPU.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))
sys.path.insert(0, str(HERE))

from reference_loader import DEFAULT_REFERENCE_PATH, load_reference, reference_available


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cases", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--rtol", type=float, default=2e-4,
                    help="tail tolerance; mid-trajectory transients get 50x this")
    cfg = ap.parse_args()

    if not reference_available():
        raise SystemExit(f"reference not found at {DEFAULT_REFERENCE_PATH}")

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch
    import jax.numpy as jnp

    ref = load_reference()
    from dualip_tpu.objectives.matching import (
        MatchingInputArgs,
        MatchingSolverDualObjectiveFunction,
    )
    from dualip_tpu.objectives.miplib import MIPLIB2017ObjectiveFunction, MIPLIBInputArgs
    from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
    from dualip_tpu.projections import create_projection_map
    from dualip_tpu.sparse import csc_from_dense

    rng = np.random.default_rng(cfg.seed)
    failures = []
    worst = 0.0

    for case in range(cfg.cases):
        kind = "matching" if case % 3 != 2 else "miplib"
        m = int(rng.integers(4, 24))
        n = int(rng.integers(20, 160))
        gamma = float(rng.choice([1e-1, 1e-2, 1e-3]))

        if kind == "matching":
            density = float(rng.uniform(0.15, 0.6))
            mask = rng.random((m, n)) < density
            for j in range(n):
                if not mask[:, j].any():
                    mask[rng.integers(m), j] = True
            dense = np.where(mask, rng.uniform(0.2, 1.0, (m, n)), 0.0).astype(np.float32)
            cvals = np.where(mask, -rng.uniform(0.1, 1.0, (m, n)), 0.0).astype(np.float32)
            b = rng.uniform(0.3, 1.5, m).astype(np.float32)
            eq = rng.random(m) < 0.2
            eq_np = eq if eq.any() else None
            decay = bool(rng.random() < 0.3)
            kw = (
                dict(gamma_decay_type="step",
                     gamma_decay_params={"decay_steps": int(rng.integers(5, 12)),
                                         "decay_factor": float(rng.uniform(0.4, 0.9))})
                if decay else {}
            )

            pm_ref = ref.proj.create_projection_map("simplex", {"z": 1.0}, n)
            robj = ref.matching.MatchingSolverDualObjectiveFunction(
                ref.matching.MatchingInputArgs(
                    A=torch.from_numpy(dense).to_sparse_csc(),
                    c=torch.from_numpy(cvals).to_sparse_csc(),
                    projection_map=pm_ref,
                    b_vec=torch.from_numpy(b),
                    equality_mask=torch.from_numpy(eq) if eq_np is not None else None,
                ),
                gamma=gamma,
            )
            rsolver = ref.agd.AcceleratedGradientDescent(
                max_iter=cfg.iters, gamma=gamma, initial_step_size=1e-3,
                max_step_size=0.1, iteration_callback=lambda i, r: None, **kw)
            rres = rsolver.maximize(robj, torch.zeros(m))

            oobj = MatchingSolverDualObjectiveFunction(
                MatchingInputArgs(
                    A=csc_from_dense(dense), c=csc_from_dense(cvals),
                    projection_map=create_projection_map("simplex", {"z": 1.0}, n),
                    b_vec=b, equality_mask=eq_np),
                gamma=gamma)
            osolver = AcceleratedGradientDescent(
                max_iter=cfg.iters, gamma=gamma, initial_step_size=1e-3,
                max_step_size=0.1, **kw)
            ores = osolver.maximize(oobj, jnp.zeros(m, jnp.float32))

            a = np.asarray(ores.dual_objective_log, dtype=np.float64)
            bb = np.asarray(rres.dual_objective_log, dtype=np.float64)
            scale = max(1.0, np.abs(bb).max())
            # Two-part verdict: the secant step-size engine amplifies fp32
            # reassociation noise transiently (a max-flip in the Lipschitz
            # window changes one step discretely), so mid-trajectory diffs
            # can spike ~50x above fp noise before BOTH trajectories
            # re-converge — measured: 1e-5 (iters 0-19) -> 8e-4 (20-40) ->
            # 5e-5 (tail) on a 100-iteration case.  The converged tail must
            # match tightly; the transient gets 50x headroom.
            diffs = np.abs(a - bb) / scale
            err = float(max(diffs[-10:].max(), diffs.max() / 50.0))
        else:
            A = rng.normal(size=(m, n)).astype(np.float32)
            c = rng.normal(size=n).astype(np.float32)
            b = rng.uniform(0.5, 2.0, m).astype(np.float32)
            even = list(range(0, n, 2))
            odd = list(range(1, n, 2))
            pm_ref = {
                **ref.proj.create_projection_map("box", {"lower": 0.0, "upper": 1.0}, n, indices=even),
                **ref.proj.create_projection_map("cone", {"lower": 0.0}, n, indices=odd),
            }
            pm_our = {
                **create_projection_map("box", {"lower": 0.0, "upper": 1.0}, n, indices=even),
                **create_projection_map("cone", {"lower": 0.0}, n, indices=odd),
            }
            robj = ref.miplib.MIPLIB2017ObjectiveFunction(
                ref.miplib.MIPLIBInputArgs(
                    A=torch.from_numpy(A), c=torch.from_numpy(c),
                    projection_map=pm_ref, b_vec=torch.from_numpy(b),
                    equality_mask=None))
            oobj = MIPLIB2017ObjectiveFunction(
                MIPLIBInputArgs(A=A, c=c, projection_map=pm_our, b_vec=b,
                                equality_mask=None))
            err = 0.0
            for _ in range(3):
                dual = rng.normal(size=m).astype(np.float32)
                rr = robj.calculate(torch.from_numpy(dual), gamma=gamma)
                oo = oobj.calculate(dual, gamma=gamma)
                g1 = rr.dual_gradient.numpy()
                g2 = np.asarray(oo.dual_gradient)
                scale = max(1.0, float(np.abs(g1).max()))
                err = max(err, float(np.abs(g1 - g2).max() / scale))
                err = max(err, abs(float(rr.dual_objective) - float(oo.dual_objective))
                          / max(1.0, abs(float(rr.dual_objective))))

        worst = max(worst, err)
        status = "ok" if err <= cfg.rtol else "FAIL"
        print(f"case {case:3d} {kind:8s} m={m:2d} n={n:3d} gamma={gamma:g} "
              f"rel_err={err:.2e} {status}")
        if err > cfg.rtol:
            failures.append(case)

    print(f"\n{cfg.cases} cases, worst rel err {worst:.2e}, "
          f"{len(failures)} failures {failures if failures else ''}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
