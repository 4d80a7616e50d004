"""One-sided cone projection: ``[lower, +inf)`` or ``(-inf, upper]``.

Parity: reference ``projections/cone.py:7-28`` (registered as ``"cone"``;
specifying both bounds is an error; neither bound == identity).
Accepts the same ``l``/``u`` short aliases as the box projection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dualip_tpu.projections.base import ProjectionOperator, register
from dualip_tpu.projections.box import _resolve


@register("cone")
class ConeProjection(ProjectionOperator):
    def __init__(self, lower=None, upper=None, l=None, u=None):  # noqa: E741 - parity with reference schema
        self.lower = _resolve(l, lower, None)
        self.upper = _resolve(u, upper, None)
        if self.lower is not None and self.upper is not None:
            raise ValueError("Only one of 'lower' or 'upper' should be specified, not both.")

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.lower is not None:
            return jnp.maximum(x, jnp.asarray(self.lower, dtype=x.dtype))
        if self.upper is not None:
            return jnp.minimum(x, jnp.asarray(self.upper, dtype=x.dtype))
        return x


@register("identity")
class IdentityProjection(ProjectionOperator):
    """Explicit identity (no constraint on the block).

    Not present in the reference registry; used internally for entities whose
    columns are not covered by any projection-map entry (the reference left
    such columns' values unchanged -- or clobbered them via a preallocated
    buffer bug, SURVEY.md §2.6; we define them as identity).
    """

    def __init__(self):
        pass

    def __call__(self, x: jax.Array) -> jax.Array:
        return x
