"""Box-cut projection: box ``[l, u]^L`` intersected with a sum cut.

Capability extension beyond the torch reference (v5.0.1 ships only box /
cone / simplex, reference ``projections/``): the box-cut polytope
``{l <= x_k <= u, sum x (=|<=) z}`` is one of the headline per-entity
constraint sets of the DuaLip papers and the Scala-era solver (reference
``README.md:150-172`` cites them), used e.g. for volume-constrained ranking
where each entity may pick *up to / exactly* ``z`` items fractionally within
per-item caps.  ``box_cut`` (sum <= z) and ``box_cut_eq`` (sum = z) slot into
the same registry / projection-map schema as every other operator.

Algorithm: the Euclidean projection is ``x*(nu) = clip(v - nu, l, u)`` where
the scalar shift ``nu`` makes the sum constraint hold (KKT of the 1-D dual);
``g(nu) = sum clip(v - nu, l, u)`` is non-increasing and piecewise-linear, so
a fixed-trip bisection on the bracket ``[min(v) - u, max(v) - l]`` (where
``g`` attains ``L*u`` and ``L*l`` respectively) converges geometrically —
branch-free, sort-free, the same TPU-friendly shape as the simplex bisection
kernel.  For the inequality variant, columns with ``sum clip(v, l, u) <= z``
are already feasible after the box clamp and pass through (``nu = 0``);
otherwise the cut is active and ``nu > 0`` solves the equality case.

Consistency anchor: with ``l = 0, u = z`` the feasible set equals the
``z``-simplex (any nonnegative vector summing to (at most) ``z`` is
coordinate-wise <= z), so box_cut must agree with the Duchi simplex oracle —
pinned in ``tests/projections/test_box_cut.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dualip_tpu.projections.base import ProjectionOperator, register
from dualip_tpu.projections.box import _resolve

Array = jax.Array

BISECTION_ITERS = 50  # matches the reference simplex bisection trip count


def box_cut_project(
    x: Array,
    lower: float,
    upper: float,
    z: float,
    inequality: bool = False,
    tol: float = 1e-6,
    max_iter: int = BISECTION_ITERS,
) -> Array:
    """Project each last-axis vector of ``x`` onto ``{l <= w <= u, sum w (<=|=) z}``."""
    dtype = x.dtype
    lt = jnp.asarray(lower, dtype)
    ut = jnp.asarray(upper, dtype)
    zt = jnp.asarray(z, dtype)

    def g(nu):  # sum of the clipped shift, (...,) for nu (...,)
        return jnp.sum(jnp.clip(x - nu[..., None], lt, ut), axis=-1)

    lo0 = jnp.min(x, axis=-1) - ut  # g(lo0) = L*u  (maximal sum)
    hi0 = jnp.max(x, axis=-1) - lt  # g(hi0) = L*l  (minimal sum)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) * 0.5
        too_high = g(mid) > zt
        return jnp.where(too_high, mid, lo), jnp.where(too_high, hi, mid)

    lo, hi = jax.lax.fori_loop(0, max_iter, body, (lo0, hi0))
    nu = (lo + hi) * 0.5
    w = jnp.clip(x - nu[..., None], lt, ut)

    if inequality:
        clipped = jnp.clip(x, lt, ut)
        feasible = jnp.sum(clipped, axis=-1) <= zt + jnp.asarray(tol, dtype)
        w = jnp.where(feasible[..., None], clipped, w)
    return w


class _BoxCutBase(ProjectionOperator):
    _inequality: bool

    def __init__(self, lower=None, upper=None, l=None, u=None, z: float = 1.0, method: str = "bisection_search"):  # noqa: E741 - short-key schema parity with box
        self.lower = _resolve(l, lower, 0.0)
        self.upper = _resolve(u, upper, 1.0)
        if self.lower is None or self.upper is None:
            raise ValueError(
                "box_cut needs finite lower AND upper bounds (use simplex/cone for one-sided sets)"
            )
        if self.lower > self.upper:
            raise ValueError(f"box_cut bounds must satisfy lower <= upper (got {self.lower} > {self.upper})")
        if method != "bisection_search":
            raise ValueError(f"Unsupported projection method: {method}")
        self.z = z

    def _check_feasible(self, L: int):
        lo, hi = L * self.lower, L * self.upper
        if self._inequality:
            if self.z < lo:
                raise ValueError(
                    f"Empty box_cut polytope: z={self.z} < L*lower={lo} (L={L})"
                )
        elif not (lo <= self.z <= hi):
            raise ValueError(
                f"Empty box_cut_eq polytope: z={self.z} outside [L*lower, L*upper]=[{lo}, {hi}] (L={L})"
            )

    def __call__(self, x: Array) -> Array:
        self._check_feasible(x.shape[-1])
        return box_cut_project(
            x, self.lower, self.upper, self.z, inequality=self._inequality
        )


@register("box_cut")
class BoxCutIneq(_BoxCutBase):
    """Projection onto ``{lower <= w <= upper, sum w <= z}``."""

    _inequality = True


@register("box_cut_eq")
class BoxCutEq(_BoxCutBase):
    """Projection onto ``{lower <= w <= upper, sum w = z}``."""

    _inequality = False
