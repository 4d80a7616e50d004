"""Time-to-certified-gap: wall-clock and iterations until the PDLP
certificate passes, measured end-to-end.

The repo's north-star metric line names "time-to-1e-6 dual gap"
(BASELINE.json) and all the machinery exists (PDLP certificate
``dualip_tpu/objectives/miplib.py::calculate_convergence_bound``, reference
``miplib.py:156-230``; ``stop_condition`` wiring ``optimizers/agd.py``) —
this script finally produces the measured artifact (VERDICT r3 #6):

* **miplib**: the bundled MIPLIB-2017 ``v150d30-2hopcds`` LP relaxation
  (reference ``examples/miplib_2017/solve_miplib_dataset.py:42-71``), solved
  with the reference's settings; every ``--check-every`` iterations the PDLP
  test runs at the current dual (primal recovered from the γ-subproblem);
  the first crossing of each tolerance is recorded with its wall time.  The
  γ-ridge bounds how tight a FIXED-γ solve can certify, so the sweep runs a
  γ-continuation schedule (γ step-decay, the solver's own mechanism) and
  reports per-tolerance (iterations, wall_s, γ at crossing).
* **matching proxy**: the synthetic matching workload has per-entity simplex
  polytopes (no box reduced-cost recovery), so the certificate does not
  apply; the PROXY gap is the relative dual-objective plateau
  ``|g_k − g_{k−W}| / (1 + |g_k|)`` — labeled as a proxy in the artifact.

Writes ``benchmark/results/certified_gap.json``.  Run on CPU for honest wall
time (the TPU pool is contended and tunneled — CLAUDE.md); pass --platform
tpu explicitly to override.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))
sys.path.insert(0, str(HERE))

RESULTS = HERE / "results" / "certified_gap.json"
TOLS = (1e-2, 1e-3, 1e-4, 1e-6)


def _append(entry):
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    data = json.loads(RESULTS.read_text()) if RESULTS.exists() else []
    data.append(entry)
    RESULTS.write_text(json.dumps(data, indent=1))
    print(json.dumps(entry))


# (γ, stage iteration cap, max_step_size, restart scheme).  Measured
# behavior (see docs/performance.md "time-to-certified-gap"): each 4× γ drop
# needs ≳4× the iterations (dual step ∝ γ) and benefits from gradient
# restart + a tighter step clamp for stability; the per-stage caps below are
# sized so the ladder spends its budget where the certificate still moves.
MIPLIB_STAGES = (
    (1e-3, 4_000, 0.1, None),
    (2.5e-4, 32_000, 0.1, None),
    (1.25e-4, 64_000, 0.1, None),
    (6.25e-5, 128_000, 0.1, None),
    (6.25e-5, 64_000, 0.03, None),
    # Deeper rungs (VERDICT r4 #6): the round-4 run floored at worst-metric
    # 1.2e-4 with pfeas binding; pfeas of the raw γ-subproblem primal scales
    # O(γ) and the REPAIRED candidate's gap cost scales with ‖viol‖₁ ∝ γ, so
    # two more 2x γ drops push the certified floor through 1e-4.
    (3.125e-5, 192_000, 0.03, None),
    (1.5625e-5, 384_000, 0.03, None),
)


def run_miplib(max_iter: int, check_every: int, f64: bool):
    """Warm-started γ-continuation ladder with in-stage certificate checks.

    At a FIXED γ the certificate floors at the ridge bias O(γ‖x‖²); decaying
    γ *inside* one solve (the solver's ``gamma_decay_type="step"``) also
    shrinks ``max_step_size`` every decay, so late stages crawl.  The ladder
    solves each γ stage with a fresh step-size engine, warm-starting the dual
    from the previous stage (the reference's own warm-start mechanism,
    ``SolverArgs.initial_dual_path`` / ``run_solver.py:127-132``); the PDLP
    test runs every ``check_every`` iterations INSIDE the stage via
    ``stop_condition`` (momentum is never reset between checks), recording
    the first wall-clock crossing of each tolerance and ending a stage when
    its certificate stops improving.
    """
    import jax.numpy as jnp
    import numpy as np

    from dualip_tpu.io.mps import read_mps_file
    from dualip_tpu.objectives.miplib import MIPLIB2017ObjectiveFunction
    from dualip_tpu.optimizers.agd import AcceleratedGradientDescent

    mps = HERE.parent / "examples" / "miplib_2017" / "v150d30-2hopcds.mps.gz"
    args = read_mps_file(str(mps)).to_miplib_input_args()
    dt = np.float64 if f64 else np.float32
    obj = MIPLIB2017ObjectiveFunction(args, dtype=dt)
    m = np.asarray(args.b_vec).shape[0]

    crossings = {}
    history = []
    best = {"worst": float("inf")}
    lam = jnp.zeros(m, dt)
    total_iters = 0
    t0 = time.perf_counter()

    lower = np.asarray(obj.lower, dtype=np.float64)
    upper = np.asarray(obj.upper, dtype=np.float64)
    b_np = np.asarray(args.b_vec, dtype=np.float64)
    from dualip_tpu.sparse.csc import csc_col_ids

    _coo = (
        np.asarray(args.A.row_indices),
        csc_col_ids(args.A),
        np.asarray(args.A.data, dtype=np.float64),
    )
    _all_A_nonpos = bool((_coo[2] <= 0).all())

    def _repair(x):
        """Feasibility repair of the γ-subproblem primal: uniformly upscale
        (covering rows, b<0) or downscale toward 0, then clamp to the box,
        and VERIFY Ax <= b numerically before use — exactly the reference's
        own practice of certifying with an explicit primal
        (``tests/objectives/test_miplib_objective.py:126-130``).  Returns a
        feasible candidate or None."""
        x = np.asarray(x, dtype=np.float64)
        Ax = np.asarray(obj.ops.matvec(jnp.asarray(x)), dtype=np.float64)
        viol = Ax - b_np
        if (viol <= 1e-12).all():
            return x
        lo = np.nan_to_num(lower, nan=-np.inf)
        up = np.nan_to_num(upper, nan=np.inf)
        x2 = None
        if _all_A_nonpos:
            # Monotone targeted repair (covering structure, every A entry
            # <= 0): raising any x_j only decreases every row of Ax, so
            # violated rows can be fixed one at a time by raising their own
            # support variables (proportionally to box headroom) without
            # hurting any other row.
            x2 = x.copy()
            rows_A, cols_A, vals_A = _coo
            for i in np.nonzero(viol > 1e-12)[0]:
                sel = rows_A == i
                js = cols_A[sel]
                aij = vals_A[sel]
                Ax_i = float(aij @ x2[js])
                need = Ax_i - b_np[i]  # > 0
                if need <= 0:
                    continue
                # raising x_j by d_j changes the row by a_ij d_j (<= 0);
                # need sum(-a_ij d_j) >= need with d_j <= headroom_j
                head = up[js] - x2[js]
                cap = float(-aij @ head)
                if cap < need:
                    x2 = None
                    break
                x2[js] = x2[js] + head * (need / cap)
        if x2 is None:
            # fallback: uniform scaling toward feasibility + clamp
            bad = viol > 1e-12
            with np.errstate(divide="ignore", invalid="ignore"):
                ratios = b_np[bad] / Ax[bad]
            if not np.isfinite(ratios).all() or (Ax[bad] == 0).any():
                return None
            s = float(ratios.max()) if (ratios > 1).any() else float(ratios.min())
            x2 = np.clip(s * x, lo, up)
        Ax2 = np.asarray(obj.ops.matvec(jnp.asarray(x2)), dtype=np.float64)
        if (Ax2 - b_np <= 1e-9).all():
            return x2
        return None

    def check(iteration_total, dual_val, g_now):
        res = obj.calculate(jnp.asarray(dual_val), gamma=g_now, save_primal=True)
        cands = [np.asarray(res.primal_var)]
        rep = _repair(res.primal_var)
        if rep is not None:
            cands.append(rep)
            # Convex blends raw→repaired: pfeas is linear in x (Ax − b) and
            # vanishes at the repaired end, while the repair's objective cost
            # grows linearly — the best worst-metric sits at an interior θ
            # whenever the raw candidate's pfeas is its binding term (the
            # round-4 floor: pfeas 1.2e-4 vs gap 3.3e-5).  Each blend is
            # certified through the same PDLP bound — no approximation.
            x0 = cands[0]
            for theta in (0.125, 0.25, 0.375, 0.5, 0.75):
                cands.append((1.0 - theta) * x0 + theta * rep)
        best_c = None
        for xc in cands:
            gap_ub, _, pfeas, dfeas, _ = obj.calculate_convergence_bound(
                jnp.asarray(dual_val), x=jnp.asarray(xc), tol=min(TOLS)
            )
            w = max(float(gap_ub), float(pfeas), float(dfeas))
            if best_c is None or w < best_c[0]:
                best_c = (w, float(gap_ub), float(pfeas), float(dfeas))
        _, gap_ub, pfeas, dfeas = best_c
        rec = {
            "iteration": iteration_total,
            "wall_s": round(time.perf_counter() - t0, 2),
            "gap_ub": float(gap_ub),
            "primal_feas": float(pfeas),
            "dual_feas": float(dfeas),
            "repaired": len(cands) > 1,
            "gamma": g_now,
            "dual_objective": float(res.dual_objective),
        }
        history.append(rec)
        worst = max(rec["gap_ub"], rec["primal_feas"], rec["dual_feas"])
        if worst < best["worst"]:
            best["worst"] = worst
            best["at"] = rec
        for tol in TOLS:
            if tol not in crossings and worst <= tol:
                crossings[tol] = rec
        return worst

    for g_now, stage_cap, max_step, restart in MIPLIB_STAGES:
        if total_iters >= max_iter or min(TOLS) in crossings:
            break
        stage_budget = min(stage_cap, max_iter - total_iters)
        base = total_iters
        stage_best = float("inf")
        state = {"stalled": 0}

        def stop(it, dual_val, _g=g_now, _base=base):
            nonlocal stage_best
            worst = check(_base + it, dual_val, _g)
            if worst < stage_best * 0.995:
                stage_best = worst
                state["stalled"] = 0
            else:
                state["stalled"] += 1
            # end the stage at its certificate floor or once a finer tol
            # than the next stage could need is certified
            return state["stalled"] >= 36 or min(TOLS) in crossings

        solver = AcceleratedGradientDescent(
            max_iter=stage_budget,
            gamma=g_now,
            initial_step_size=1e-5,
            max_step_size=max_step,
            restart=restart,
            stop_condition=stop,
            stop_check_every=check_every,
        )
        res = solver.maximize(obj, lam)
        lam = jnp.asarray(res.dual_val)
        total_iters += len(res.dual_objective_log)

    total = time.perf_counter() - t0
    entry = {
        "workload": "miplib_v150d30-2hopcds",
        "kind": "pdlp_certificate",
        "dtype": "float64" if f64 else "float32",
        "m": int(m),
        "n": int(np.asarray(args.c).shape[0]),
        "max_iter": max_iter,
        "check_every": check_every,
        "stages": [list(s) for s in MIPLIB_STAGES],
        "iterations_run": total_iters,
        "total_wall_s": round(total, 2),
        "final_dual_objective": history[-1]["dual_objective"] if history else None,
        "time_to_tol": {
            f"{tol:g}": {
                "iterations": crossings[tol]["iteration"],
                "wall_s": crossings[tol]["wall_s"],
                "gamma": crossings[tol]["gamma"],
            }
            if tol in crossings
            else None
            for tol in TOLS
        },
        "best_certified": best.get("at"),
        "final_check": history[-1] if history else None,
    }
    # a rerun supersedes prior entries for the same workload+kind
    if RESULTS.exists():
        data = json.loads(RESULTS.read_text())
        data = [
            e
            for e in data
            if not (
                e.get("workload") == entry["workload"]
                and e.get("kind") == entry["kind"]
            )
        ]
        RESULTS.write_text(json.dumps(data, indent=1))
    _append(entry)


# Matching ladder: (gamma, stage iteration cap).  Same warm-started
# continuation mechanism as MIPLIB_STAGES; the exact certificate floors at
# the ridge bias O(gamma*||x||^2) per stage, so each stage runs until its
# certificate stalls, then gamma drops 4x.  The dual's smoothness constant
# scales 1/gamma, so each 4x drop needs ~4x the budget to RE-converge — the
# deep stages dominate.  TPU-sized (measured: ~2.5 ms/iter at the 2.5M probe
# including a certificate check every 200 iterations — a quiet-window 400k-
# iteration ladder is ~17 min; CPU at ~220 ms/iter would take a day).
MATCHING_STAGES = (
    (1e-3, 3_000),
    (2.5e-4, 20_000),
    (6.25e-5, 90_000),
    (1.5625e-5, 320_000),
    (3.9e-6, 600_000),
)


def run_matching_exact(
    num_sources: int, max_iter: int, check_every: int, layout=None, average=True
):
    """Time-to-EXACT-certified-gap on the synthetic matching workload
    (VERDICT r4 #2): replaces the round-4 dual-plateau proxy with the true
    sandwich ``MatchingSolverDualObjectiveFunction.exact_certificate`` —
    closed-form unregularized dual bound + coupling-row-repaired primal.
    Tolerances are on the PDLP-normalized relative gap |p−d|/(1+|p|+|d|).

    ``average=True`` additionally certifies the per-stage ERGODIC AVERAGES:
    individual γ-subproblem primals at small γ are near-vertex solutions that
    oscillate (their coupling-row repair costs O(1) objective), but their
    running mean converges to the optimal fractional solution with vanishing
    violations — the standard dual-decomposition primal-recovery result.
    x̄ stays per-entity feasible (each simplex block is convex), so the same
    exact row-scaling repair applies, computed here on the host in float64.
    λ̄ gets a g₀ evaluation too (g₀ is concave: g₀(λ̄) ≥ mean g₀).  Both
    averages reset at each γ stage.  Needs save_primal, which bypasses the
    tile cache — pass ``average=False`` for canonical-scale runs that must
    stage from the primed cache.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
    from generate_synthetic_data import generate_synthetic_matching_input_args

    import os

    import bench

    args = generate_synthetic_matching_input_args(num_sources, 10_000, 1e-3, seed=42)
    if layout is None:
        layout = "butterfly" if jax.default_backend() == "tpu" else "csc"
    compact = os.environ.get("DUALIP_BENCH_COMPACT") == "1" and layout == "butterfly"
    m = 10_000

    # One objective serves every gamma stage (gamma flows through the solver
    # into calculate_traceable / exact_certificate); the bench construction
    # reuses the plan + device-ready tile caches, so the canonical-scale run
    # stages instead of rebuilding.
    obj = bench.build_bench_objective(
        args, num_sources, 10_000, 1e-3, 42, layout=layout, keep_flat_idx=average
    )

    # Host-side exact repair of an explicit primal (float64): every edge
    # belongs to one coupling row, so scaling a violated row r by b_r/(Ax)_r
    # restores Ax ≤ b exactly while keeping each entity inside its simplex.
    a_np = np.asarray(args.A.data, dtype=np.float64)
    c_np = np.asarray(args.c.data, dtype=np.float64)  # minimization costs
    rows_np = np.asarray(args.A.row_indices, dtype=np.int64)
    b_np = np.asarray(args.b_vec, dtype=np.float64)

    def certify_primal(x):
        ax = np.bincount(rows_np, weights=a_np * x, minlength=m)
        cx = np.bincount(rows_np, weights=c_np * x, minlength=m)
        s = np.where(ax > b_np, b_np / np.maximum(ax, 1e-300), 1.0)
        return float(np.minimum(s, 1.0) @ cx)

    crossings = {}
    history = []
    best = {"gap_rel": float("inf")}
    # Running sandwich: primal_ub and dual_lb each bound OPT independently of
    # the iterate that produced them, so the certified gap at any point in
    # time is (min primal_ub seen) − (max dual_lb seen) — strictly tighter
    # than any single check, and still a TRUE certificate.
    sandwich = {"primal_ub": float("inf"), "dual_lb": float("-inf")}
    lam = jnp.zeros(m, jnp.float32)
    total_iters = 0
    t0 = time.perf_counter()

    for g_now, stage_cap in MATCHING_STAGES:
        if total_iters >= max_iter or min(TOLS) in crossings:
            break
        stage_budget = min(stage_cap, max_iter - total_iters)
        base = total_iters
        state = {"stalled": 0, "stage_best": float("inf")}
        avg = {"xsum": None, "lsum": np.zeros(m, np.float64), "k": 0}

        def stop(it, dual_val, _obj=obj, _g=g_now, _base=base, _avg=avg):
            cert = _obj.exact_certificate(dual_val, gamma=_g)
            sandwich["primal_ub"] = min(sandwich["primal_ub"], cert["primal_ub"])
            sandwich["dual_lb"] = max(sandwich["dual_lb"], cert["dual_lb"])
            rec_avg = {}
            if average:
                res = _obj.calculate(jnp.asarray(dual_val), gamma=_g, save_primal=True)
                x = np.asarray(res.primal_var, dtype=np.float64)
                _avg["xsum"] = x if _avg["xsum"] is None else _avg["xsum"] + x
                _avg["lsum"] += np.asarray(dual_val, dtype=np.float64)
                _avg["k"] += 1
                p_avg = certify_primal(_avg["xsum"] / _avg["k"])
                d_avg = _obj.exact_certificate(
                    jnp.asarray((_avg["lsum"] / _avg["k"]).astype(np.float32)),
                    gamma=_g,
                )["dual_lb"]
                sandwich["primal_ub"] = min(sandwich["primal_ub"], p_avg)
                sandwich["dual_lb"] = max(sandwich["dual_lb"], d_avg)
                rec_avg = {"primal_ub_avg": p_avg, "dual_lb_avg": d_avg}
            p, d = sandwich["primal_ub"], sandwich["dual_lb"]
            sand_rel = (p - d) / (1.0 + abs(p) + abs(d))
            rec = {
                "iteration": _base + it,
                "wall_s": round(time.perf_counter() - t0, 2),
                "gamma": _g,
                **{k: cert[k] for k in ("primal_ub", "dual_lb", "gap_abs", "gap_rel")},
                **rec_avg,
                "sandwich_gap_rel": sand_rel,
            }
            history.append(rec)
            if sand_rel < best["gap_rel"]:
                best.update(gap_rel=sand_rel, at=rec)
            for tol in TOLS:
                if tol not in crossings and sand_rel <= tol:
                    crossings[tol] = rec
            # Patient stall rule: deep-γ stages improve slowly but steadily
            # (dual smoothness ∝ 1/γ) — a 0.5%-per-check bar ended stages
            # thousands of iterations before their certificate floor.
            if sand_rel < state["stage_best"] * 0.999:
                state["stage_best"] = sand_rel
                state["stalled"] = 0
            else:
                state["stalled"] += 1
            return state["stalled"] >= 60 or min(TOLS) in crossings

        solver = AcceleratedGradientDescent(
            max_iter=stage_budget,
            gamma=g_now,
            initial_step_size=1e-3,
            max_step_size=1e-1,
            stop_condition=stop,
            stop_check_every=check_every,
            launch_chunk=int(os.environ.get("DUALIP_BENCH_LAUNCH_CHUNK", "0")),
        )
        res = solver.maximize(obj, lam)
        lam = jnp.asarray(np.asarray(res.dual_val))
        total_iters += len(res.dual_objective_log)

    entry = {
        "workload": f"matching_synthetic_{num_sources}x10000",
        "kind": "exact_gap",
        "note": (
            "TRUE certificate: exact unregularized dual bound g0 (closed-form "
            "over simplex blocks) + feasible primal via coupling-row repair "
            "(MatchingSolverDualObjectiveFunction.exact_certificate); "
            "tolerances on the PDLP-normalized relative gap of the running "
            "sandwich (min primal_ub seen, max dual_lb seen — each bound "
            "holds independently, so the pair is still a true certificate)"
            + (
                "; per-stage ergodic averages x̄/λ̄ certified alongside the "
                "raw iterates (dual-decomposition primal recovery)"
                if average
                else ""
            )
        ),
        "averaged": average,
        "layout": layout + ("/compact" if compact else ""),
        "backend": jax.default_backend(),
        "nnz": int(args.A.nnz),
        "max_iter": max_iter,
        "check_every": check_every,
        "stages": [list(s) for s in MATCHING_STAGES],
        "iterations_run": total_iters,
        "total_wall_s": round(time.perf_counter() - t0, 2),
        "time_to_tol": {
            f"{tol:g}": {
                "iterations": crossings[tol]["iteration"],
                "wall_s": crossings[tol]["wall_s"],
                "gamma": crossings[tol]["gamma"],
            }
            if tol in crossings
            else None
            for tol in TOLS
        },
        "best_certified": best.get("at"),
        "final_check": history[-1] if history else None,
    }
    # the exact certificate supersedes the round-4 plateau proxy for this
    # workload — drop the proxy entry when the real thing lands
    if RESULTS.exists():
        data = json.loads(RESULTS.read_text())
        data = [
            e
            for e in data
            if not (
                e.get("workload") == entry["workload"]
                and e.get("kind") in ("dual_plateau_proxy", "exact_gap")
            )
        ]
        RESULTS.write_text(json.dumps(data, indent=1))
    _append(entry)


def run_matching_proxy(num_sources: int, max_iter: int, window: int):
    import jax.numpy as jnp
    import numpy as np

    from dualip_tpu.objectives.matching import MatchingSolverDualObjectiveFunction
    from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
    from generate_synthetic_data import generate_synthetic_matching_input_args

    args = generate_synthetic_matching_input_args(num_sources, 10_000, 1e-3, seed=42)
    obj = MatchingSolverDualObjectiveFunction(args, gamma=1e-3)
    solver = AcceleratedGradientDescent(
        max_iter=max_iter, gamma=1e-3, initial_step_size=1e-3, max_step_size=1e-1
    )
    t0 = time.perf_counter()
    res = solver.maximize(obj, jnp.zeros(10_000, jnp.float32))
    total = time.perf_counter() - t0
    log = np.asarray(res.dual_objective_log, dtype=np.float64)
    per_iter = total / max_iter
    crossings = {}
    for tol in TOLS:
        idx = None
        for k in range(window, len(log)):
            if abs(log[k] - log[k - window]) / (1.0 + abs(log[k])) <= tol:
                idx = k + 1
                break
        crossings[f"{tol:g}"] = (
            {"iterations": idx, "wall_s": round(idx * per_iter, 2)} if idx else None
        )
    entry = {
        "workload": f"matching_synthetic_{num_sources}x10000",
        "kind": "dual_plateau_proxy",
        "note": (
            "per-entity simplex polytopes admit no PDLP reduced-cost primal "
            "recovery; proxy = relative dual-objective plateau over a "
            f"{window}-iteration window (NOT a certificate)"
        ),
        "nnz": int(args.A.nnz),
        "max_iter": max_iter,
        "window": window,
        "total_wall_s": round(total, 2),
        "ms_per_iter": round(1000 * per_iter, 2),
        "final_dual_objective": float(res.dual_objective),
        "time_to_tol": crossings,
    }
    _append(entry)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--miplib", action="store_true")
    ap.add_argument("--matching-exact", action="store_true")
    ap.add_argument(
        "--no-average",
        action="store_true",
        help="skip ergodic-average certification (keeps the tile-cache fast path)",
    )
    ap.add_argument("--layout", default=None, help="matching-exact layout (default: per-backend)")
    ap.add_argument("--matching-proxy", action="store_true")
    ap.add_argument("--max-iter", type=int, default=1_000_000)
    ap.add_argument("--check-every", type=int, default=1000)
    ap.add_argument("--f32", action="store_true", help="solve/certify in float32 (default float64)")
    ap.add_argument("--sources", type=int, default=250_000)
    ap.add_argument("--proxy-window", type=int, default=100)
    args = ap.parse_args()

    import jax

    # the TPU here registers through an experimental PJRT plugin whose
    # platform name is not "tpu" — pass --platform ambient to let JAX pick
    # the best available backend (the TPU when one is attached)
    if args.platform not in ("ambient", ""):
        jax.config.update("jax_platforms", args.platform)
    if args.miplib and not args.f32:
        jax.config.update("jax_enable_x64", True)

    if args.miplib:
        run_miplib(args.max_iter, args.check_every, f64=not args.f32)
    if args.matching_exact:
        # check cadence trades crossing-time granularity against per-check
        # cost (with averaging each check also fetches x̂ device→host, which
        # re-stages the next launch on the tunneled pool — don't over-check)
        run_matching_exact(
            args.sources,
            args.max_iter,
            args.check_every if args.no_average else min(args.check_every, 500),
            layout=args.layout,
            average=not args.no_average,
        )
    if args.matching_proxy:
        run_matching_proxy(args.sources, min(args.max_iter, 2000), args.proxy_window)
    if not (args.miplib or args.matching_proxy or args.matching_exact):
        sys.exit("pass --miplib, --matching-exact and/or --matching-proxy")


if __name__ == "__main__":
    main()
