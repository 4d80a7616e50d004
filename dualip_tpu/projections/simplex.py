"""Batched simplex projections (inequality and equality variants).

Parity: reference ``projections/simplex.py`` — two algorithms:

* ``duchi`` (default): sort → cumsum → rho threshold → theta (Duchi et al.
  2008), reference ``simplex.py:126-236``;
* ``bisection_search``: 50-iteration bisection on the shift ``nu``
  (branch-free, no sort), reference ``simplex.py:6-123``.

Both keep the reference's two fast paths (reference ``simplex.py:40-80``):
the inequality early-exit (already-feasible columns pass through) and the
top-2 "vertex shortcut" (``max > second_max + z`` ⇒ the projection is the
one-hot vertex ``z·e_argmax``).

TPU-native differences:

* Everything is **branch-free**: instead of boolean-mask gather/scatter of the
  infeasible columns (data-dependent shapes, impossible under XLA), all paths
  are computed for all columns and combined with ``jnp.where``.  Under jit XLA
  fuses this into one pass over the tile.
* Operates along the **last axis** of a ``(..., L)`` tile (the reference used
  ``(L, B)`` column matrices).
* The bisection variant normalizes by ``z`` consistently (the reference mixed
  a normalized max with un-normalized values, reference ``simplex.py:87-89``,
  which is only correct for ``z == 1``; both are identical at ``z == 1``,
  where the reference's parity tests operate).

Zero padding: callers project zero-padded blocks and discard the padded lanes
afterwards, exactly like the reference's ``apply_F_to_columns`` contract
(reference ``sparse_utils.py:150-214``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dualip_tpu.projections.base import ProjectionOperator, register

Array = jax.Array


def _top2_last(x: Array):
    """(max, second_max, argmax) along the last axis, branch-free."""
    v0 = jnp.max(x, axis=-1)
    i0 = jnp.argmax(x, axis=-1)
    masked = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1) == i0[..., None],
        jnp.asarray(-jnp.inf, dtype=x.dtype),
        x,
    )
    v1 = jnp.max(masked, axis=-1)
    return v0, v1, i0


def _one_hot_vertex(x: Array, i0: Array, z) -> Array:
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane == i0[..., None], jnp.asarray(z, dtype=x.dtype), jnp.zeros((), dtype=x.dtype))


def duchi_project(x: Array, z: float = 1.0, inequality: bool = False, tol: float = 1e-6) -> Array:
    """Project each last-axis vector of ``x`` onto ``{w >= 0, sum w (<=|=) z}``.

    Faithful to reference ``simplex.py:126-236`` including its initial
    ``clamp(x, min=0)`` (applied in both the equality and inequality case).
    """
    dtype = x.dtype
    L = x.shape[-1]
    zt = jnp.asarray(z, dtype=dtype)
    x = jnp.maximum(x, jnp.zeros((), dtype=dtype))

    # Full Duchi path (computed for every column; selection below).
    u = jnp.sort(x, axis=-1)[..., ::-1]  # descending
    css = jnp.cumsum(u, axis=-1)
    idx1 = (jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1) + 1).astype(dtype)
    cond = u - (css - zt) / idx1 > 0
    idx0 = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    rho = jnp.max(jnp.where(cond, idx0, 0), axis=-1)
    css_at_rho = jnp.take_along_axis(css, rho[..., None], axis=-1)[..., 0]
    theta = (css_at_rho - zt) / (rho.astype(dtype) + 1)
    w = jnp.maximum(x - theta[..., None], jnp.zeros((), dtype=dtype))

    if L > 1:
        v0, v1, i0 = _top2_last(x / zt)
        shortcut = (v0 - v1) > 1.0
        w = jnp.where(shortcut[..., None], _one_hot_vertex(x, i0, zt), w)

    if inequality:
        # After the clamp all entries are >= 0, so feasibility reduces to the
        # sum test (reference simplex.py:154).
        feasible = jnp.sum(x, axis=-1) <= zt + jnp.asarray(tol, dtype=dtype)
        w = jnp.where(feasible[..., None], x, w)
    return w


def bisection_project(
    x: Array,
    z: float = 1.0,
    inequality: bool = False,
    tol: float = 1e-6,
    max_iter: int = 50,
) -> Array:
    """Bisection-search simplex projection (reference ``simplex.py:6-123``).

    Branch-free: runs the fixed ``max_iter`` bisection for every column (the
    reference's early-exit is a CPU optimization; on TPU the fixed-trip loop
    vectorizes and converges to the same ``tol``).

    Semantics anchor to ``duchi_project`` (the golden-traced default), NOT to
    the reference's bisection, which had two defects its own parity tests
    skirted: (a) no initial clamp, so the equality case disagreed with Duchi
    on negative inputs; (b) the inequality fast path required *raw* ``x >= 0``
    (reference ``simplex.py:41``), so a column like ``[-0.5, 0.3]`` was forced
    onto the ``sum == z`` facet instead of the correct interior ``[0, 0.3]``.
    Pre-clamping (as Duchi does) fixes both at once: entries are nonnegative,
    so inequality feasibility reduces to the sum test.
    """
    dtype = x.dtype
    L = x.shape[-1]
    zt = jnp.asarray(z, dtype=dtype)
    tolt = jnp.asarray(tol, dtype=dtype)
    x = jnp.maximum(x, jnp.zeros((), dtype=dtype))

    xn = x / zt
    x_max = jnp.max(xn, axis=-1, keepdims=True)
    x_shifted = xn - x_max

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) * 0.5
        s = jnp.sum(jnp.maximum(x_shifted - mid[..., None], jnp.zeros((), dtype=dtype)), axis=-1)
        too_high = s > 1.0
        return jnp.where(too_high, mid, lo), jnp.where(too_high, hi, mid)

    lo0 = jnp.full(x.shape[:-1], -1.0, dtype=dtype)
    hi0 = jnp.zeros(x.shape[:-1], dtype=dtype)
    lo, hi = jax.lax.fori_loop(0, max_iter, body, (lo0, hi0))
    nu = (lo + hi) * 0.5
    w = jnp.maximum(x_shifted - nu[..., None], jnp.zeros((), dtype=dtype)) * zt

    if L > 1:
        v0, v1, i0 = _top2_last(xn)
        shortcut = (v0 - v1) > 1.0
        w = jnp.where(shortcut[..., None], _one_hot_vertex(x, i0, zt), w)

    if inequality:
        # After the clamp all entries are >= 0, so feasibility reduces to the
        # sum test (mirrors duchi_project).
        feasible = jnp.sum(x, axis=-1) <= zt + tolt
        w = jnp.where(feasible[..., None], x, w)
    return w


@register("simplex")
class SimplexIneq(ProjectionOperator):
    """Projection onto ``{w >= 0, sum w <= z}`` (reference ``simplex.py:239-255``)."""

    def __init__(self, z: float = 1.0, method: str = "duchi"):
        if z <= 0:
            raise ValueError("Simplex radius z must be positive.")
        if method not in ("duchi", "bisection_search"):
            raise ValueError(f"Unsupported projection method: {method}")
        self.z = z
        self.proj_method = method

    def __call__(self, x: Array) -> Array:
        if self.proj_method == "bisection_search":
            return bisection_project(x, z=self.z, inequality=True)
        return duchi_project(x, z=self.z, inequality=True)


@register("simplex_eq")
class SimplexEq(ProjectionOperator):
    """Projection onto ``{w >= 0, sum w = z}`` (reference ``simplex.py:258-274``)."""

    def __init__(self, z: float = 1.0, method: str = "duchi"):
        if z <= 0:
            raise ValueError("Simplex radius z must be positive.")
        if method not in ("duchi", "bisection_search"):
            raise ValueError(f"Unsupported projection method: {method}")
        self.z = z
        self.proj_method = method

    def __call__(self, x: Array) -> Array:
        if self.proj_method == "bisection_search":
            return bisection_project(x, z=self.z, inequality=False)
        return duchi_project(x, z=self.z, inequality=False)
