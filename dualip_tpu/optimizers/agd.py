"""Nesterov accelerated gradient ascent (the Maximizer).

Parity: reference ``optimizers/agd.py:66-229`` — FISTA β-sequence, per-
iteration Lipschitz-window step size, dual projection onto the nonnegative
cone with equality-row passthrough, γ step-decay, iteration callback, and
per-iteration dual-objective / step-size logs.  Golden traces
(``tests/test_agd.py:93-107``, ``tests/objectives/
test_dualip_matching_simplex.py:129-141``) are reproduced to 1e-5.

TPU-native design (SURVEY.md §7.1):

* The whole solve — every objective evaluation, step-size window update,
  Nesterov update, γ decay, and the per-iteration metric log — is ONE
  ``lax.scan`` program compiled once and launched once (chunked only when a
  per-iteration observer is attached).  The reference did a device→host sync
  per iteration (``agd.py:167``, defect SURVEY.md §2.6.6); here the entire
  metric history accumulates on device and is fetched in a single transfer
  at the end.  On tunneled PJRT backends a program launch re-stages its
  argument buffers, so one-launch-per-solve is also what makes large problem
  tiles affordable.
* The final iteration's full ObjectiveResult is assembled from the scan's
  last-step metrics and the gradient carried out of the loop — no separate
  evaluation program (``save_primal`` adds exactly one extra launch).
* Objective state (the problem tiles) is threaded through as an explicit
  pytree argument, so XLA sees real buffers (shardable across the mesh), not
  embedded constants.
* There is no rank asymmetry: under SPMD every process runs the identical
  update on replicated duals (the reference reduced to rank 0 and broadcast
  back, ``agd.py:204-206`` — that round-trip does not exist here).
"""

from __future__ import annotations

import functools
import inspect
import math
import os
import time
from typing import Any, Callable, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dualip_tpu.optimizers.agd_utils import (
    DEFAULT_HISTORY_LENGTH,
    StepSizeState,
    calculate_step_size,
    init_step_size_state,
)
from dualip_tpu.types import ObjectiveResult, SolverResult
from dualip_tpu.utils.mlflow_utils import _mlflow_state, log_metrics, log_objective_result

Array = jax.Array


def project_on_nn_cone(y: Array, equality_mask: Optional[Array] = None) -> Array:
    """Project duals onto the nonnegative cone; equality rows stay free
    (reference ``agd.py:13-21``)."""
    projected = jnp.maximum(y, jnp.zeros((), dtype=y.dtype))
    if equality_mask is not None:
        return jnp.where(equality_mask, y, projected)
    return projected


def compute_beta_seq(max_iter: int) -> np.ndarray:
    """FISTA momentum sequence β_i = (1 - t_{i+1}) / t_{i+2} with
    t_{i+1} = (1 + sqrt(1 + 4 t_i²)) / 2 (reference ``agd.py:93-100``).

    Computed host-side in float32 storage with float64 sqrt, matching the
    reference's torch semantics so the golden traces line up.
    """
    t = np.zeros(max_iter + 2, dtype=np.float32)
    for i in range(1, max_iter + 2):
        t[i] = np.float32((1.0 + math.sqrt(1.0 + 4.0 * float(np.float32(t[i - 1]) ** 2))) / 2.0)
    beta = np.zeros(max_iter, dtype=np.float32)
    for i in range(max_iter):
        beta[i] = (np.float32(1.0) - t[i + 1]) / t[i + 2]
    return beta


def format_objective_result_summary(iteration: int, objective_result: ObjectiveResult) -> str:
    """One-line per-iteration summary (reference ``agd.py:24-63``)."""

    def _fmt(name, val):
        if val is None:
            return None
        try:
            arr = np.asarray(val)
            if np.issubdtype(arr.dtype, np.floating) and arr.size == 1 and np.isnan(arr):
                return None
            if arr.size == 1:
                return f"{name}={arr.item()}"
            return f"{name}.shape={tuple(arr.shape)}"
        except Exception:
            return f"{name}=<unprintable>"

    grad_norm_str = None
    if objective_result.dual_gradient is not None:
        try:
            grad_norm = float(np.linalg.norm(np.asarray(objective_result.dual_gradient)))
            grad_norm_str = f"dual_grad_norm={grad_norm}"
        except Exception:
            grad_norm_str = "dual_grad_norm=<unprintable>"

    parts = [
        f"iter={iteration}",
        _fmt("dual_objective", objective_result.dual_objective),
        grad_norm_str,
        _fmt("reg_penalty", objective_result.reg_penalty),
        _fmt("primal_objective", objective_result.primal_objective),
        _fmt("primal_var", objective_result.primal_var),
        _fmt("dual_val_times_grad", objective_result.dual_val_times_grad),
        _fmt("max_pos_slack", objective_result.max_pos_slack),
        _fmt("sum_pos_slack", objective_result.sum_pos_slack),
    ]
    return " | ".join(p for p in parts if p is not None)


class _Metrics(NamedTuple):
    """Per-iteration scalars logged on device inside the scan."""

    dual_objective: Array
    step_size: Array
    grad_norm: Array
    gamma: Array
    reg_penalty: Array
    dual_val_times_grad: Array
    max_pos_slack: Array
    sum_pos_slack: Array


class _Carry(NamedTuple):
    x: Array
    y: Array
    ss_state: StepSizeState
    gamma: Array
    max_step_size: Array
    last_grad: Array  # gradient evaluated at this iteration's x (pre-update)
    last_x: Array  # the x the last objective evaluation used (for save_primal)
    beta_idx: Array  # iterations since the last adaptive restart (int32)
    prev_obj: Array  # previous dual objective (function-restart test)


class AcceleratedGradientDescent:
    """Maximizes a dual objective with Nesterov-accelerated ascent.

    Same constructor surface as the reference (``agd.py:66-91``) plus:

    * ``callback_chunk``: when an iteration callback or MLflow logging is
      active, iterations run in chunks of this size and the callback is
      invoked once per iteration with exact values (``callback_chunk``
      iterations late).  Without an observer the whole solve is one program.
    * ``collect_stats``: record wall-clock phases of the next ``maximize``
      in ``last_run_stats`` (used by benchmarks).
    * ``launch_chunk``: cap iterations per device launch (0 = whole solve is
      one program); for shared/preemptible pools whose per-execution watchdog
      kills long launches.  NOTE: ``launch_chunk=1`` is clamped to 2 (with a
      warning) — a fully unrolled per-iteration program fuses differently
      and drifts ~1e-5 from the single-launch solve; 2 is the smallest chunk
      that keeps numerics bit-identical.
    """

    def __init__(
        self,
        max_iter: int,
        gamma: Optional[float],
        initial_step_size: float = 1e-5,
        max_step_size: float = 0.1,
        gamma_decay_type: Optional[str] = None,
        gamma_decay_params: Optional[dict] = None,
        save_primal: bool = False,
        iteration_callback: Optional[Callable[[int, ObjectiveResult], None]] = None,
        history_length: int = DEFAULT_HISTORY_LENGTH,
        callback_chunk: int = 1,
        verbose: bool = False,
        stop_condition: Optional[Callable[[int, Array], bool]] = None,
        stop_check_every: int = 0,
        restart: Optional[str] = None,
        restart_min_spacing: int = 50,
        launch_chunk: int = 0,
    ):
        if gamma_decay_type not in (None, "step"):
            raise ValueError(f"Unsupported gamma decay type: {gamma_decay_type}")
        if restart not in (None, "gradient", "function"):
            raise ValueError(f"Unsupported restart scheme: {restart!r}")
        self.max_iter = max_iter
        self.gamma = gamma
        self.initial_step_size = float(initial_step_size)
        self.max_step_size = float(max_step_size)
        self.gamma_decay_type = gamma_decay_type
        self.gamma_decay_params = gamma_decay_params or {}
        self.save_primal = save_primal
        self.history_length = history_length
        self.callback_chunk = max(1, int(callback_chunk))
        self.beta_seq = compute_beta_seq(max_iter)
        self.verbose = verbose
        self.iteration_callback = iteration_callback
        if iteration_callback is None and verbose:
            self.iteration_callback = self._default_iteration_callback
        # Optional early stopping — an extension over the reference, which
        # always ran max_iter iterations (reference agd.py:150, SURVEY §5):
        # every `stop_check_every` iterations, `stop_condition(iteration,
        # dual_val)` is evaluated host-side (e.g. the PDLP certificate,
        # MIPLIB2017ObjectiveFunction.calculate_convergence_bound); returning
        # True ends the solve. Off by default — golden traces are unaffected.
        self.stop_condition = stop_condition
        self.stop_check_every = int(stop_check_every)
        if stop_condition is not None and self.stop_check_every <= 0:
            self.stop_check_every = 100
        # Cap iterations per device launch (0 = whole solve in one program).
        # Chunked launches enqueue back-to-back with NO host round-trip
        # (metrics stay on device), so numerics and async pipelining are
        # unchanged — the knob exists for shared/preemptible device pools
        # whose per-execution watchdog kills long single launches.
        self.launch_chunk = max(0, int(launch_chunk))
        if self.launch_chunk == 1:
            # chunk=1 fully unrolls the scan into per-iteration programs whose
            # fusion differs from the chunked/scanned program at the ~1e-5
            # level (tests/test_agd.py excludes it); clamp to the smallest
            # chunk that keeps numerics bit-identical to the one-launch solve.
            import warnings

            warnings.warn(
                "launch_chunk=1 drifts ~1e-5 from the single-launch solve "
                "(per-iteration program fusion); clamping to 2.",
                stacklevel=2,
            )
            self.launch_chunk = 2
        # Adaptive restart (extension; O'Donoghue & Candès 2015, "Adaptive
        # restart for accelerated gradient schemes"): Nesterov momentum is
        # optimal for plain smooth problems but OSCILLATES on strongly-
        # concave-ish duals (the ridge gives g_gamma curvature); resetting
        # the beta sequence when momentum turns against the ascent direction
        # ("gradient" scheme: <grad, y_k - y_{k-1}> < 0) or when the dual
        # objective drops ("function" scheme) restores linear convergence.
        # Off by default — the reference has no restart and the golden traces
        # pin the plain beta sequence.
        #
        # ``restart_min_spacing``: minimum iterations between restarts.  On
        # polyhedral LP duals (non-strongly-concave, dual-cone projection,
        # secant step noise) the raw test can fire almost every iteration and
        # degenerate the method to UNACCELERATED ascent — measured on the
        # bundled MIPLIB instance (iterations to reach dual 27.1; plain =
        # 2151): gradient restart, spacing 10 -> 4317, spacing 50 -> 2151
        # (harmless); function restart stalls even at spacing 100 (6750 and
        # final 27.57 < 27.62).  The default spacing 50 makes "gradient" safe
        # on LP duals while keeping the strongly-concave win intact (restart
        # periods there are ~pi*sqrt(kappa), e.g. ~99 at kappa=1e3); prefer
        # "gradient" — use "function" only on smooth strongly-concave duals.
        self.restart = restart
        self.restart_min_spacing = int(restart_min_spacing)
        # Compiled chunk-runner cache keyed per objective identity; also holds
        # which ObjectiveResult fields the objective produces (trace-time).
        self._jit_cache = {}
        self.collect_stats = False
        self.last_run_stats = None
        # Per-chunk wall clocks (benchmark protocol, bench.py): when set with
        # launch_chunk > 0, each chunk is terminated by a device→host fetch of
        # one scalar (``block_until_ready`` is a NO-OP on tunneled PJRT pools,
        # so a fetch is the only honest completion signal) and its wall time
        # recorded in ``chunk_walls`` as (iterations, seconds).  The fetch can
        # force argument re-staging on the next launch, so each wall is an
        # honest UPPER bound on that chunk's per-iteration cost — the min over
        # chunks samples the quietest sub-window inside one solve.
        self.collect_chunk_walls = False
        self.chunk_walls: List[tuple] = []

    def _default_iteration_callback(self, iteration: int, objective_result: ObjectiveResult) -> None:
        try:
            print(format_objective_result_summary(iteration, objective_result))
        except Exception:
            pass  # logging must never crash a solve (reference agd.py:117-119)

    # ------------------------------------------------------------------
    def _calc(self, f, params: Any, dual_val: Array, gamma: Optional[Array]) -> ObjectiveResult:
        """Invoke the objective's traceable calculate with reference kwargs
        semantics (gamma passed only when configured, reference agd.py:152)."""
        g = gamma if self.gamma is not None else None
        if hasattr(f, "calculate_traceable"):
            return f.calculate_traceable(params, dual_val, g)
        # Duck-typed objectives (reference-style: just a pure `calculate`,
        # see reference tests/test_agd.py:9-45) are traced directly.
        kwargs = {"gamma": g} if self.gamma is not None else {}
        return f.calculate(dual_val=dual_val, **kwargs)

    def _make_step(self, f, equality_mask, dtype, fields_present: dict):
        decay = self.gamma_decay_type == "step"
        if decay:
            decay_steps = int(self.gamma_decay_params["decay_steps"])
            decay_factor = float(self.gamma_decay_params["decay_factor"])

        nan = jnp.asarray(jnp.nan, dtype=dtype)

        def opt(val, name):
            # Record at trace time which optional fields exist.
            fields_present[name] = val is not None
            return jnp.asarray(val, dtype=dtype) if val is not None else nan

        restart = self.restart
        if restart is not None:
            # restart mode indexes the beta sequence by iterations-since-
            # restart (carried), not by absolute iteration number
            beta_full = jnp.asarray(self.beta_seq)

        def step(params, carry: _Carry, it_num: Array, beta: Array):
            res = self._calc(f, params, carry.x, carry.gamma)
            grad = res.dual_gradient
            step_size, ss_state = calculate_step_size(
                grad, carry.y, carry.ss_state, self.initial_step_size, carry.max_step_size
            )
            y_new = project_on_nn_cone(carry.x + grad * step_size, equality_mask)
            beta_idx, prev_obj = carry.beta_idx, carry.prev_obj
            if restart is not None:
                if restart == "gradient":
                    # ascent form of O'Donoghue-Candès: momentum against the
                    # gradient direction => kill it this update
                    bad = jnp.vdot(grad, y_new - carry.y) < 0
                else:  # "function": the dual objective went down
                    bad = jnp.asarray(res.dual_objective, dtype) < prev_obj
                bad = jnp.logical_and(bad, beta_idx >= self.restart_min_spacing)
                beta = jnp.where(bad, jnp.zeros((), beta_full.dtype), beta_full[beta_idx])
                beta_idx = jnp.where(bad, 1, beta_idx + 1)
                prev_obj = jnp.asarray(res.dual_objective, dtype)
            x_new = y_new * (1.0 - beta) + carry.y * beta
            gamma, max_step = carry.gamma, carry.max_step_size
            if decay:
                do = (it_num % decay_steps) == 0
                gamma = jnp.where(do, gamma * decay_factor, gamma)
                max_step = jnp.where(do, step_size * decay_factor, max_step)
                if restart == "function":
                    # Shrinking gamma legitimately lowers g_gamma, so the
                    # next iteration's objective drop is the decay, not
                    # oscillation — disarm the function-restart test across
                    # the boundary.
                    prev_obj = jnp.where(do, jnp.asarray(-jnp.inf, dtype), prev_obj)
            metrics = _Metrics(
                dual_objective=jnp.asarray(res.dual_objective, dtype=dtype),
                step_size=jnp.asarray(step_size, dtype=dtype),
                grad_norm=jnp.linalg.norm(grad).astype(dtype),
                gamma=jnp.asarray(gamma, dtype=dtype),
                reg_penalty=opt(res.reg_penalty, "reg_penalty"),
                dual_val_times_grad=opt(res.dual_val_times_grad, "dual_val_times_grad"),
                max_pos_slack=opt(res.max_pos_slack, "max_pos_slack"),
                sum_pos_slack=opt(res.sum_pos_slack, "sum_pos_slack"),
            )
            new_carry = _Carry(
                x=x_new,
                y=y_new,
                ss_state=ss_state,
                gamma=gamma,
                max_step_size=max_step,
                last_grad=grad,
                last_x=carry.x,
                beta_idx=beta_idx,
                prev_obj=prev_obj,
            )
            return new_carry, metrics

        return step

    def _init_carry(self, x0: Array, gamma0: Array, ss0: StepSizeState) -> "_Carry":
        """Build the scan carry.  A hook for subclass maximizers: override it
        together with ``_make_step``; ``maximize`` only relies on the carry
        exposing ``x``, ``y``, ``gamma``, ``last_grad``, ``last_x``."""
        m = x0.shape[0]
        dtype = x0.dtype
        return _Carry(
            x=x0,
            y=x0,
            ss_state=ss0,
            gamma=gamma0,
            max_step_size=jnp.asarray(self.max_step_size, dtype=jnp.float32),
            last_grad=jnp.zeros(m, dtype=dtype),
            last_x=x0,
            beta_idx=jnp.zeros((), jnp.int32),
            prev_obj=jnp.asarray(-jnp.inf, dtype=dtype),
        )

    # ------------------------------------------------------------------
    def maximize(
        self,
        f,
        initial_value: Array,
        rank: int = 0,
        initial_step_size_state: Optional[StepSizeState] = None,
    ) -> SolverResult:
        """Run ``max_iter`` ascent iterations (no early stopping, reference
        ``agd.py:150-208``).  ``f`` must expose ``equality_mask``, ``params``
        (a pytree, may be ``()``), and a pure ``calculate_traceable(params,
        dual_val, gamma) -> ObjectiveResult``.  ``rank`` is accepted for API
        parity; SPMD replicates the update on every process.

        ``initial_step_size_state`` (e.g. from ``checkpoint.load_dual``)
        resumes the Lipschitz window so a warm-started solve re-enters the
        secant step-size regime immediately.
        """
        _timing = os.environ.get("DUALIP_TIMING") == "1"
        t_start = time.perf_counter()

        x0 = jnp.asarray(initial_value)
        dtype = x0.dtype
        m = x0.shape[0]
        equality_mask = getattr(f, "equality_mask", None)
        if equality_mask is not None:
            equality_mask = jnp.asarray(equality_mask)
        params = getattr(f, "params", ())

        gamma0 = jnp.asarray(self.gamma if self.gamma is not None else jnp.nan, dtype=jnp.float32)
        ss0 = (
            initial_step_size_state
            if initial_step_size_state is not None
            else init_step_size_state(m, self.history_length, dtype)
        )
        carry = self._init_carry(x0, gamma0, ss0)
        beta_all = jnp.asarray(self.beta_seq)
        it_all = jnp.arange(1, self.max_iter + 1, dtype=jnp.int32)

        # Key on the objective object itself (identity hash): holding the
        # reference prevents id() reuse from aliasing a stale executable.
        cache_key = (f, bool(equality_mask is not None), str(dtype))
        cached = self._jit_cache.get(cache_key)
        if cached is None:
            fields_present: dict = {}
            step = self._make_step(f, equality_mask, dtype, fields_present)

            # NOTE: carry donation was tried and reverted — the initial carry
            # aliases the caller's initial_value (x == y == last_x), which
            # donation both rejects (double-donate) and would invalidate.
            @jax.jit
            def run_chunk(params, carry, it_chunk, beta_chunk):
                def body(c, inp):
                    return step(params, c, inp[0].astype(jnp.int32), inp[1])

                return jax.lax.scan(body, carry, (it_chunk, beta_chunk))

            cached = (run_chunk, fields_present)
            self._jit_cache[cache_key] = cached
        run_chunk, fields_present = cached

        observing = self.iteration_callback is not None or _mlflow_state.is_enabled()
        chunk = self.callback_chunk if observing else (self.launch_chunk or self.max_iter)
        if self.stop_condition is not None:
            chunk = min(chunk, self.stop_check_every)

        dual_obj_log: List[float] = []
        step_size_log: List[float] = []
        deferred: List[_Metrics] = []
        last_observed_row = None  # last fetched metrics row (observing mode)

        self.chunk_walls = []
        pos = 0
        while pos < self.max_iter:
            size = min(chunk, self.max_iter - pos)
            t0 = time.perf_counter() if (_timing or self.collect_chunk_walls) else 0.0
            carry, metrics = run_chunk(
                params, carry, it_all[pos : pos + size], beta_all[pos : pos + size]
            )
            if self.collect_chunk_walls:
                jax.device_get(carry.gamma)  # fetch-terminated: forces chunk completion
                self.chunk_walls.append((size, time.perf_counter() - t0))
            if _timing:
                jax.block_until_ready(carry)
                print(f"[timing] chunk pos={pos} size={size}: {time.perf_counter()-t0:.3f}s")
            if not observing:
                deferred.append(metrics)
                pos += size
                if self.stop_condition is not None and self.stop_condition(pos, carry.y):
                    break
                continue
            mnp = jax.tree_util.tree_map(np.asarray, metrics)
            last_observed_row = jax.tree_util.tree_map(lambda a: a[-1], mnp)
            dual_obj_log.extend(mnp.dual_objective.tolist())
            step_size_log.extend(mnp.step_size.tolist())
            for k in range(size):
                it = pos + 1 + k
                per_iter_res = self._metrics_row_to_result(mnp, k, fields_present)
                if self.iteration_callback is not None:
                    self.iteration_callback(it, per_iter_res)
                # Per-iteration MLflow metric contract (reference
                # agd.py:190-201), fed from the chunked device logs.
                if _mlflow_state.is_enabled():
                    iteration_metrics = {
                        "step_size": float(mnp.step_size[k]),
                        "dual_objective": float(mnp.dual_objective[k]),
                    }
                    if self.gamma is not None:
                        iteration_metrics["gamma"] = float(mnp.gamma[k])
                    log_metrics(iteration_metrics, step=it)
                    log_objective_result(per_iter_res, step=it)
            pos += size
            if self.stop_condition is not None and self.stop_condition(pos, carry.y):
                break

        # One batched host transfer for everything the host needs; the
        # gradient itself stays on device inside the ObjectiveResult.
        t_drain = time.perf_counter() if (_timing or self.collect_stats) else 0.0
        deferred_np, gamma_np = jax.device_get((deferred, carry.gamma))
        for mnp in deferred_np:
            dual_obj_log.extend(np.asarray(mnp.dual_objective).tolist())
            step_size_log.extend(np.asarray(mnp.step_size).tolist())
        if _timing:
            print(f"[timing] drain: {time.perf_counter()-t_drain:.3f}s")
        if self.collect_stats:
            now = time.perf_counter()
            self.last_run_stats = {
                "total_s": now - t_start,
                "iters": self.max_iter,
                "drain_s": now - t_drain,
            }

        dual_obj = dual_obj_log[-1]

        # Final-iteration ObjectiveResult assembled from the last scan step
        # (reference returns the last calculate()'s result, agd.py:211-229).
        if deferred_np:
            last = jax.tree_util.tree_map(lambda a: np.asarray(a)[-1], deferred_np[-1])
        else:
            last = last_observed_row
        final_res = ObjectiveResult(
            dual_gradient=carry.last_grad,
            dual_objective=np.float32(dual_obj),
            reg_penalty=(
                np.float32(last.reg_penalty) if last is not None and fields_present.get("reg_penalty") else None
            ),
            dual_val_times_grad=(
                np.float32(last.dual_val_times_grad)
                if last is not None and fields_present.get("dual_val_times_grad")
                else None
            ),
            max_pos_slack=(
                np.float32(last.max_pos_slack) if last is not None and fields_present.get("max_pos_slack") else None
            ),
            sum_pos_slack=(
                np.float32(last.sum_pos_slack) if last is not None and fields_present.get("sum_pos_slack") else None
            ),
        )
        if self.save_primal:
            # One extra evaluation at the final iteration's x (the reference
            # honored save_primal only on the last iteration, agd.py:155-158).
            # Mirror _calc's kwargs semantics: gamma only when configured, and
            # optional kwargs only if the (possibly duck-typed, reference-
            # style) objective accepts them.
            kwargs = {}
            if self.gamma is not None:
                kwargs["gamma"] = carry.gamma
            try:
                accepted = inspect.signature(f.calculate).parameters
                if "save_primal" in accepted:
                    kwargs["save_primal"] = True
                if "rank" in accepted:
                    kwargs["rank"] = rank
            except (TypeError, ValueError):
                kwargs.update(save_primal=True, rank=rank)
            final_res = f.calculate(dual_val=carry.last_x, **kwargs)

        if _mlflow_state.is_enabled():
            log_objective_result(final_res, step=self.max_iter)

        # Track γ decay for API completeness (reference mutated self.gamma).
        if self.gamma is not None:
            self.gamma = float(gamma_np)

        return SolverResult(
            dual_val=carry.y,
            dual_objective=float(dual_obj),
            objective_result=final_res,
            dual_objective_log=dual_obj_log,
            step_size_log=step_size_log,
        )

    @staticmethod
    def _metrics_row_to_result(mnp, k: int, fields_present: dict) -> ObjectiveResult:
        def get(name):
            return np.float32(getattr(mnp, name)[k]) if fields_present.get(name) else None

        return ObjectiveResult(
            dual_gradient=None,
            dual_objective=np.float32(mnp.dual_objective[k]),
            reg_penalty=get("reg_penalty"),
            dual_val_times_grad=get("dual_val_times_grad"),
            max_pos_slack=get("max_pos_slack"),
            sum_pos_slack=get("sum_pos_slack"),
        )
