"""Lipschitz-history step-size engine, as a pure functional state machine.

Parity: reference ``optimizers/agd_utils.py:12-89`` — a sliding window of the
last ``H`` (gradient, dual) pairs; pairwise secant Lipschitz estimates
``L_i = ||g_{i+1}-g_i|| / ||d_{i+1}-d_i||``; step = ``min(1/max_i L_i,
max_step_size)``, falling back to ``initial_step_size`` until the window is
full or when the estimate is NaN/Inf, and to ``max_step_size`` when the
max estimate is exactly zero (reference ``agd_utils.py:44-62``).

TPU-native difference: the reference kept Python lists of tensors and popped/
appended per iteration (host-side state, reference ``agd_utils.py:12-28``).
Here the window is a fixed-shape ``(H, m)`` rolling device buffer so the whole
computation stays inside ``jit``/``lax.scan`` — the "history not full" logic
becomes a ``jnp.where`` on an iteration counter instead of Python branching
(SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

DEFAULT_HISTORY_LENGTH = 15  # reference agd_utils.py:70


class StepSizeState(NamedTuple):
    """Rolling window state. ``grad_hist``/``dual_hist`` hold the last H
    (gradient, dual) pairs in chronological order (oldest first); ``count`` is
    the number of valid trailing rows (saturates at H)."""

    grad_hist: Array  # (H, m)
    dual_hist: Array  # (H, m)
    count: Array  # () int32


def init_step_size_state(m: int, history_length: int = DEFAULT_HISTORY_LENGTH, dtype=jnp.float32) -> StepSizeState:
    return StepSizeState(
        grad_hist=jnp.zeros((history_length, m), dtype=dtype),
        dual_hist=jnp.zeros((history_length, m), dtype=dtype),
        count=jnp.zeros((), dtype=jnp.int32),
    )


def norm_of_difference(x: Array, y: Array) -> Array:
    """L2 norm of (x - y) (reference ``agd_utils.py:4-9``)."""
    return jnp.linalg.norm(x - y)


def estimate_lipschitz_constant(grad_one, grad_two, dual_one, dual_two) -> Array:
    """Secant Lipschitz estimate (reference ``agd_utils.py:31-41``)."""
    return norm_of_difference(grad_one, grad_two) / norm_of_difference(dual_one, dual_two)


def calculate_step_size(
    dual_grad: Array,
    dual_val: Array,
    state: StepSizeState,
    initial_step_size: float,
    max_step_size: Array,
) -> Tuple[Array, StepSizeState]:
    """Push the new (grad, dual) pair and return (step_size, new_state).

    Traceable; ``max_step_size`` may be a traced scalar (γ-decay rescales it,
    reference ``agd.py:107``).
    """
    H = state.grad_hist.shape[0]
    grad_hist = jnp.concatenate([state.grad_hist[1:], dual_grad[None].astype(state.grad_hist.dtype)], axis=0)
    dual_hist = jnp.concatenate([state.dual_hist[1:], dual_val[None].astype(state.dual_hist.dtype)], axis=0)
    count = jnp.minimum(state.count + 1, H)

    # Pairwise consecutive secant estimates over the window: (H-1,)
    dg = jnp.linalg.norm(grad_hist[1:] - grad_hist[:-1], axis=1)
    dd = jnp.linalg.norm(dual_hist[1:] - dual_hist[:-1], axis=1)
    lipschitz = dg / dd  # inf where dd == 0, mirroring the reference's division

    l_max = jnp.max(lipschitz)
    bad = jnp.isnan(l_max) | jnp.isinf(l_max)
    candidate = jnp.where(l_max != 0, 1.0 / l_max, max_step_size)
    full_step = jnp.minimum(candidate, max_step_size)

    # Initial step until the window is full (len(history) == H ⇒ H-1 pairs,
    # reference agd_utils.py:56-57), or when the estimate blew up.
    use_initial = (count < H) | bad
    step = jnp.where(use_initial, jnp.asarray(initial_step_size, dtype=full_step.dtype), full_step)
    return step, StepSizeState(grad_hist=grad_hist, dual_hist=dual_hist, count=count)
