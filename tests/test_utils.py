"""Step-size engine unit tests (parity: reference ``tests/test_utils.py``),
adapted to the functional rolling-buffer state machine."""

import jax.numpy as jnp
import numpy as np

from dualip_tpu.optimizers.agd_utils import (
    StepSizeState,
    calculate_step_size,
    estimate_lipschitz_constant,
    init_step_size_state,
    norm_of_difference,
)


def test_norm_of_difference():
    x = jnp.array([1.0, 2.0, 3.0])
    y = jnp.array([4.0, 5.0, 6.0])
    assert np.allclose(norm_of_difference(x, y), np.sqrt(27.0))


def test_estimate_lipschitz_constant():
    L = estimate_lipschitz_constant(
        jnp.array([1.0, 2.0]), jnp.array([3.0, 4.0]), jnp.array([5.0, 6.0]), jnp.array([7.0, 8.0])
    )
    assert float(L) > 0


def test_history_rolls():
    state = init_step_size_state(2, history_length=2)
    g1, d1 = jnp.array([1.0, 2.0]), jnp.array([3.0, 4.0])
    g2, d2 = jnp.array([5.0, 6.0]), jnp.array([7.0, 8.0])
    g3, d3 = jnp.array([9.0, 10.0]), jnp.array([11.0, 12.0])

    _, state = calculate_step_size(g1, d1, state, 0.1, jnp.float32(1.0))
    assert int(state.count) == 1
    assert np.allclose(state.grad_hist[-1], g1)

    _, state = calculate_step_size(g2, d2, state, 0.1, jnp.float32(1.0))
    assert int(state.count) == 2

    _, state = calculate_step_size(g3, d3, state, 0.1, jnp.float32(1.0))
    # Oldest entry evicted; window keeps (g2, g3).
    assert int(state.count) == 2
    assert np.allclose(state.grad_hist[0], g2)
    assert np.allclose(state.grad_hist[1], g3)


def test_initial_step_until_window_full():
    """Reference agd_utils.py:56-57: initial step until H pairs are stored."""
    H = 5
    state = init_step_size_state(2, history_length=H)
    for i in range(H - 1):
        step, state = calculate_step_size(
            jnp.array([1.0 + i, 2.0]), jnp.array([3.0 + i, 4.0]), state, 0.1, jnp.float32(1.0)
        )
        assert float(step) == np.float32(0.1)
    # H-th push fills the window -> secant-based step.
    step, state = calculate_step_size(
        jnp.array([1.0 + H, 2.0]), jnp.array([3.0 + H, 4.0]), state, 0.1, jnp.float32(1.0)
    )
    # grads and duals both advance by exactly (1, 0) each push -> L == 1 -> step = min(1/1, 1.0)
    assert np.isclose(float(step), 1.0)


def test_full_window_constant_lipschitz():
    H = 3
    state = init_step_size_state(1, history_length=H)
    # d moves by 1 each step, g moves by 2 -> L = 2, step = min(1/2, max)
    for i in range(H):
        step, state = calculate_step_size(
            jnp.array([2.0 * i]), jnp.array([1.0 * i]), state, 0.1, jnp.float32(1.0)
        )
    assert np.isclose(float(step), 0.5)
    # clamped by max_step_size
    step, state = calculate_step_size(
        jnp.array([2.0 * H]), jnp.array([1.0 * H]), state, 0.1, jnp.float32(0.25)
    )
    assert np.isclose(float(step), 0.25)


def test_nan_inf_fallback():
    """Reference agd_utils.py:59-60: NaN/Inf max estimate -> initial step."""
    H = 2
    state = init_step_size_state(1, history_length=H)
    # identical duals -> dd = 0 -> L = inf -> fall back to initial even when full
    for _ in range(H + 1):
        step, state = calculate_step_size(
            jnp.array([1.0]), jnp.array([5.0]), state, 0.1, jnp.float32(1.0)
        )
    assert np.isclose(float(step), np.float32(0.1))


def test_zero_lipschitz_gives_max_step():
    """Reference agd_utils.py:61: L_max == 0 -> candidate = max_step_size."""
    H = 2
    state = init_step_size_state(1, history_length=H)
    # duals move, grads constant -> L = 0
    for i in range(H):
        step, state = calculate_step_size(
            jnp.array([1.0]), jnp.array([float(i)]), state, 0.1, jnp.float32(0.7)
        )
    assert np.isclose(float(step), np.float32(0.7))
