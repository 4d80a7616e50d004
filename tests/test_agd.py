"""Golden-trace AGD regression tests (parity: reference ``tests/test_agd.py``).

The pinned dual-objective values at iterations {2, 16, 23, 29} come from the
original Scala solver and are matched to 1e-5, same as the reference
(``tests/test_agd.py:93-107``)."""

import jax.numpy as jnp
import numpy as np

from dualip_tpu.optimizers.agd import AcceleratedGradientDescent, project_on_nn_cone
from dualip_tpu.types import ObjectiveResult


class Quadratic1DObjective:
    """f(x) = -(x - 3)^2, grad = -2(x - 3) (reference test_agd.py:9-25)."""

    equality_mask = None

    def calculate(self, dual_val, save_primal=False, **kwargs):
        x = dual_val[0]
        obj = -((x - 3.0) ** 2)
        grad = jnp.stack([-2.0 * (x - 3.0)])
        return ObjectiveResult(dual_gradient=grad, dual_objective=obj)


class SimpleObjective:
    """f(x, y) = -(x-3)^2 - (y+5)^2 (reference test_agd.py:28-45)."""

    equality_mask = None

    def calculate(self, dual_val, save_primal=False, **kwargs):
        x, y = dual_val[0], dual_val[1]
        obj = -((x - 3.0) ** 2) - (y + 5.0) ** 2
        grad = jnp.stack([-2.0 * (x - 3.0), -2.0 * (y + 5.0)])
        return ObjectiveResult(dual_gradient=grad, dual_objective=obj)


def test_quadratic_1d_function():
    initial_gradient = 6.0
    default_step_size = 1e-5

    solver = AcceleratedGradientDescent(max_iter=1, gamma=None)
    res = solver.maximize(Quadratic1DObjective(), jnp.array([0.0], dtype=jnp.float32))
    assert abs(float(res.dual_val[0]) - initial_gradient * default_step_size) < 1e-10

    solver2 = AcceleratedGradientDescent(max_iter=1, gamma=None, initial_step_size=0.1)
    res2 = solver2.maximize(Quadratic1DObjective(), jnp.array([0.0], dtype=jnp.float32))
    assert abs(float(res2.dual_val[0]) - initial_gradient * 0.1) < 1e-7


def test_simple_objective_dual_value():
    solver = AcceleratedGradientDescent(max_iter=30, gamma=None, initial_step_size=1e-5)
    res = solver.maximize(SimpleObjective(), jnp.zeros(2, dtype=jnp.float32))

    true_values = [
        (2, -33.9996400036),
        (16, -28.60551547593112),
        (23, -25.473701313626133),
        (29, -25.00382134903756),
    ]
    for i, true_val in true_values:
        got = res.dual_objective_log[i - 1]
        assert abs(got - true_val) < 1e-5, f"iteration {i}: expected {true_val}, got {got}"


def test_project_on_nn_cone_with_equality_mask():
    """Equality rows keep their (possibly negative) sign (reference
    tests/test_equality_constraints.py:8-15)."""
    y = jnp.array([-1.0, -1.0, 2.0, -3.0, 4.0])
    mask = jnp.array([False, True, False, True, False])
    out = project_on_nn_cone(y, mask)
    assert np.allclose(out, [0.0, -1.0, 2.0, -3.0, 4.0])


def test_logs_have_max_iter_entries():
    solver = AcceleratedGradientDescent(max_iter=7, gamma=None)
    res = solver.maximize(SimpleObjective(), jnp.zeros(2, dtype=jnp.float32))
    assert len(res.dual_objective_log) == 7
    assert len(res.step_size_log) == 7
    assert res.dual_objective == res.dual_objective_log[-1]


def test_iteration_callback_invoked_per_iteration():
    seen = []
    solver = AcceleratedGradientDescent(
        max_iter=5, gamma=None, iteration_callback=lambda i, r: seen.append((i, float(np.asarray(r.dual_objective))))
    )
    solver.maximize(SimpleObjective(), jnp.zeros(2, dtype=jnp.float32))
    assert [i for i, _ in seen] == [1, 2, 3, 4, 5]


def test_gamma_decay_changes_gamma():
    class GammaProbe:
        equality_mask = None

        def calculate(self, dual_val, gamma=None, save_primal=False, **kwargs):
            # dual objective reports gamma so the log exposes the decay schedule
            return ObjectiveResult(
                dual_gradient=jnp.zeros_like(dual_val), dual_objective=jnp.asarray(gamma)
            )

        def calculate_traceable(self, params, dual_val, gamma):
            return self.calculate(dual_val, gamma)

        params = ()

    solver = AcceleratedGradientDescent(
        max_iter=6,
        gamma=1.0,
        gamma_decay_type="step",
        gamma_decay_params={"decay_steps": 2, "decay_factor": 0.5},
    )
    res = solver.maximize(GammaProbe(), jnp.zeros(3, dtype=jnp.float32))
    # gamma seen by calculate at iters 1..6: decays after iters 2, 4 (and 6, unseen)
    assert np.allclose(res.dual_objective_log, [1.0, 1.0, 0.5, 0.5, 0.25, 0.25])


class StrictToyObjective:
    """Duck-typed objective whose calculate takes ONLY dual_val (no gamma/
    save_primal/rank and no **kwargs) — the minimal reference-style surface."""

    equality_mask = None

    def calculate(self, dual_val):
        x = dual_val[0]
        return ObjectiveResult(
            dual_gradient=jnp.stack([-2.0 * (x - 3.0)]), dual_objective=-((x - 3.0) ** 2)
        )


def test_save_primal_with_strict_duck_typed_objective():
    # Regression: the save_primal final evaluation used to pass
    # gamma/save_primal/rank unconditionally, crashing after the solve on
    # objectives that don't accept them.
    solver = AcceleratedGradientDescent(max_iter=3, gamma=None, save_primal=True)
    res = solver.maximize(StrictToyObjective(), jnp.array([0.0], dtype=jnp.float32))
    assert np.isfinite(res.dual_objective)
    assert res.objective_result.dual_gradient is not None


def test_launch_chunk_bit_identical():
    """Chunked device launches (shared-pool watchdog knob) reproduce the
    single-launch solve bit for bit: the chunks slice the same iteration/beta
    sequences and never sync to host between launches.  (chunk=1 is excluded
    by design: XLA unrolls single-iteration scans into a differently-fused
    program, shifting results at the fp-reassociation level ~1e-5.)"""
    lam0 = jnp.array([0.0, 0.0], dtype=jnp.float32)
    whole = AcceleratedGradientDescent(
        max_iter=30, gamma=None, initial_step_size=1e-3
    ).maximize(SimpleObjective(), lam0)
    for chunk in (7, 30, 64):
        chunked = AcceleratedGradientDescent(
            max_iter=30, gamma=None, initial_step_size=1e-3, launch_chunk=chunk
        ).maximize(SimpleObjective(), lam0)
        assert np.array_equal(
            np.asarray(whole.dual_objective_log), np.asarray(chunked.dual_objective_log)
        ), chunk
        assert np.array_equal(np.asarray(whole.dual_val), np.asarray(chunked.dual_val))
