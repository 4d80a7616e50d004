"""Box projection: clamp each coordinate to ``[lower, upper]``.

Parity: reference ``projections/box.py:6-16`` (registered as ``"box"``,
defaults ``lower=0, upper=1``).

Schema fix vs the reference: the reference's MIPLIB bound extraction reads
``"l"``/``"u"`` keys while its MPS reader emits ``"lower"``/``"upper"``
(reference ``miplib.py:117-120`` vs ``read_mps_data.py:185`` — defect noted in
SURVEY.md §2.6.4).  We accept both spellings, and treat a ``NaN`` bound as
"absent" (one-sided box), which the reference's own tests rely on
(``tests/objectives/test_miplib_objective.py:29-32``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from dualip_tpu.projections.base import ProjectionOperator, register


def _resolve(alias_short, alias_long, default):
    if alias_short is not None and alias_long is not None:
        raise ValueError("Specify either the short ('l'/'u') or long ('lower'/'upper') key, not both")
    val = alias_short if alias_short is not None else alias_long
    if val is None:
        return default
    if isinstance(val, float) and math.isnan(val):
        return None  # NaN bound == no bound on that side
    return val


@register("box")
class BoxProjection(ProjectionOperator):
    """Clamp to ``[lower, upper]`` per coordinate (identity on absent sides)."""

    def __init__(self, lower=None, upper=None, l=None, u=None):  # noqa: E741 - parity with reference schema
        self.lower = _resolve(l, lower, 0.0)
        self.upper = _resolve(u, upper, 1.0)

    def __call__(self, x: jax.Array) -> jax.Array:
        out = x
        if self.lower is not None:
            out = jnp.maximum(out, jnp.asarray(self.lower, dtype=x.dtype))
        if self.upper is not None:
            out = jnp.minimum(out, jnp.asarray(self.upper, dtype=x.dtype))
        return out
