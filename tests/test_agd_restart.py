"""Adaptive restart (O'Donoghue & Candès 2015) for the AGD maximizer.

Extension over the reference (which has no restart; its plain FISTA beta
sequence is pinned by the golden traces, which run with the default
``restart=None`` and are therefore untouched).  On an ill-conditioned
strongly concave dual, plain Nesterov momentum oscillates (O(1/k²)), while
adaptive restart recovers linear convergence — these tests pin that the
restarted solve is strictly and substantially more converged at the same
iteration count, and that both schemes stay consistent with the plain
solver's optimum on a real matching LP.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
from dualip_tpu.types import ObjectiveResult


class IllConditionedQuadratic:
    """g(λ) = -0.5 λᵀDλ + bᵀλ, maximized at λ* = b/D (condition number κ)."""

    equality_mask = None

    def __init__(self, kappa=1000.0, m=64, seed=0):
        rng = np.random.default_rng(seed)
        self.d = jnp.asarray(
            np.geomspace(1.0, kappa, m).astype(np.float32)
        )  # eigenvalues 1..κ
        self.b = jnp.asarray(rng.uniform(0.5, 2.0, m).astype(np.float32) * np.asarray(self.d))
        self.g_star = float(0.5 * np.sum(np.asarray(self.b) ** 2 / np.asarray(self.d)))

    def calculate(self, dual_val, save_primal=False, **kwargs):
        obj = -0.5 * jnp.vdot(dual_val, self.d * dual_val) + jnp.vdot(self.b, dual_val)
        grad = self.b - self.d * dual_val
        return ObjectiveResult(dual_gradient=grad, dual_objective=obj)


@pytest.mark.parametrize("scheme", ["gradient", "function"])
def test_restart_beats_plain_on_ill_conditioned(scheme):
    obj = IllConditionedQuadratic()
    iters = 800

    def gap(restart):
        solver = AcceleratedGradientDescent(
            max_iter=iters, gamma=None, initial_step_size=1e-4,
            max_step_size=1.0, restart=restart,
        )
        res = solver.maximize(obj, jnp.zeros(64, jnp.float32))
        return obj.g_star - float(res.dual_objective_log[-1])

    plain, restarted = gap(None), gap(scheme)
    assert plain > 0 and restarted > -1e-3
    # linear convergence vs O(1/k²): orders of magnitude at κ=1e3, k=800
    assert restarted < 1e-2 * plain, (plain, restarted)


def test_restart_consistent_on_matching_lp():
    """Both schemes reach at least the plain solver's dual objective on a
    random matching LP (monotone-ish improvement, no divergence)."""
    from dualip_tpu.objectives.matching import (
        MatchingInputArgs,
        MatchingSolverDualObjectiveFunction,
    )
    from dualip_tpu.projections import create_projection_map
    from dualip_tpu.sparse import csc_from_dense

    rng = np.random.default_rng(5)
    m, n = 12, 80
    dense = np.where(rng.random((m, n)) < 0.4, rng.uniform(0.2, 1.0, (m, n)), 0.0)
    for j in range(n):
        if not dense[:, j].any():
            dense[rng.integers(m), j] = 0.5
    dense = dense.astype(np.float32)
    cvals = np.where(dense != 0, -rng.uniform(0.1, 1.0, (m, n)), 0.0).astype(np.float32)
    b = rng.uniform(0.3, 1.5, m).astype(np.float32)
    args = MatchingInputArgs(
        A=csc_from_dense(dense), c=csc_from_dense(cvals),
        projection_map=create_projection_map("simplex", {"z": 1.0}, n), b_vec=b)
    obj = MatchingSolverDualObjectiveFunction(args, gamma=1e-2)

    def final(restart):
        solver = AcceleratedGradientDescent(
            max_iter=150, gamma=1e-2, initial_step_size=1e-3, max_step_size=0.1,
            restart=restart,
        )
        return float(solver.maximize(obj, jnp.zeros(m, jnp.float32)).dual_objective)

    plain = final(None)
    for scheme in ("gradient", "function"):
        assert final(scheme) >= plain - 1e-3, (scheme, final(scheme), plain)


def test_restart_none_is_bit_identical():
    """The restart plumbing must not perturb the default path (golden-trace
    safety): restart=None reproduces the existing trace bit for bit."""
    obj = IllConditionedQuadratic(kappa=50.0, m=8, seed=1)
    kw = dict(max_iter=60, gamma=None, initial_step_size=1e-3, max_step_size=0.5)
    r1 = AcceleratedGradientDescent(**kw).maximize(obj, jnp.zeros(8, jnp.float32))
    r2 = AcceleratedGradientDescent(**kw, restart=None).maximize(obj, jnp.zeros(8, jnp.float32))
    np.testing.assert_array_equal(
        np.asarray(r1.dual_objective_log), np.asarray(r2.dual_objective_log)
    )


def test_invalid_restart_scheme_raises():
    with pytest.raises(ValueError, match="restart"):
        AcceleratedGradientDescent(max_iter=10, gamma=None, restart="bogus")


def test_restart_spacing_guards_lp_duals():
    """The spacing floor prevents restart from degenerating to unaccelerated
    ascent on non-strongly-concave duals: with spacing 1 the function scheme
    fires constantly and falls behind plain acceleration; with the default
    spacing the gradient scheme never loses to plain on the quadratic."""
    obj = IllConditionedQuadratic(kappa=200.0, m=32, seed=3)

    def final(restart, spacing):
        solver = AcceleratedGradientDescent(
            max_iter=400, gamma=None, initial_step_size=1e-4, max_step_size=1.0,
            restart=restart, restart_min_spacing=spacing,
        )
        return float(
            solver.maximize(obj, jnp.zeros(32, jnp.float32)).dual_objective_log[-1]
        )

    plain = final(None, 50)
    assert final("gradient", 50) >= plain - 1e-4


def test_spacing_gate_is_wired():
    """Direct mechanism test: an effectively-infinite spacing blocks every
    restart (trace bit-identical to plain), while spacing 1 lets restarts
    fire (trace differs)."""
    obj = IllConditionedQuadratic(kappa=400.0, m=16, seed=2)
    kw = dict(max_iter=200, gamma=None, initial_step_size=1e-4, max_step_size=1.0)

    def log(restart, spacing):
        solver = AcceleratedGradientDescent(**kw, restart=restart,
                                            restart_min_spacing=spacing)
        return np.asarray(
            solver.maximize(obj, jnp.zeros(16, jnp.float32)).dual_objective_log
        )

    plain = log(None, 50)
    np.testing.assert_array_equal(log("gradient", 10**9), plain)  # gate blocks all
    assert not np.array_equal(log("gradient", 1), plain)  # restarts actually fire


def test_function_restart_ignores_gamma_decay_boundaries():
    """Shrinking gamma legitimately lowers g_gamma; the function scheme must
    not read that as oscillation.  With decay_steps >= spacing, a spurious
    boundary restart would reset momentum every decay step — the trace must
    instead track the no-restart trace closely on a well-behaved LP."""
    from dualip_tpu.objectives.matching import (
        MatchingInputArgs,
        MatchingSolverDualObjectiveFunction,
    )
    from dualip_tpu.projections import create_projection_map
    from dualip_tpu.sparse import csc_from_dense

    rng = np.random.default_rng(9)
    m, n = 10, 60
    dense = np.where(rng.random((m, n)) < 0.5, rng.uniform(0.2, 1.0, (m, n)), 0.0)
    for j in range(n):
        if not dense[:, j].any():
            dense[rng.integers(m), j] = 0.5
    dense = dense.astype(np.float32)
    cvals = np.where(dense != 0, -rng.uniform(0.1, 1.0, (m, n)), 0.0).astype(np.float32)
    b = rng.uniform(0.3, 1.5, m).astype(np.float32)
    args = MatchingInputArgs(
        A=csc_from_dense(dense), c=csc_from_dense(cvals),
        projection_map=create_projection_map("simplex", {"z": 1.0}, n), b_vec=b)
    obj = MatchingSolverDualObjectiveFunction(args, gamma=5e-2)
    kw = dict(max_iter=240, gamma=5e-2, initial_step_size=1e-3, max_step_size=0.1,
              gamma_decay_type="step",
              gamma_decay_params={"decay_steps": 60, "decay_factor": 0.5})

    def final(restart, spacing=50):
        solver = AcceleratedGradientDescent(**kw, restart=restart,
                                            restart_min_spacing=spacing)
        return float(solver.maximize(obj, jnp.zeros(m, jnp.float32)).dual_objective)

    plain = final(None)
    assert final("function") >= plain - 5e-3, (final("function"), plain)
