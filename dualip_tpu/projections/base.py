"""Projection registry and map schema.

API parity with the reference registry (reference ``projections/base.py:8-97``):
``ProjectionEntry``, ``ProjectionOperator``, ``register``/``project`` and
``create_projection_map`` keep their names and semantics.

TPU-native difference: every operator's ``__call__`` is a *pure, batched* JAX
function applied along the **last axis** of its input (a ``(..., L)`` tile of
per-entity variable blocks), so it can be traced under ``jit``/``shard_map``
and vmapped for free.  The reference instead applied operators to ``(L, B)``
column matrices (reference ``sparse_utils.py:133-220``).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Dict, List, Union

import jax

Array = jax.Array


@dataclass
class ProjectionEntry:
    """One entry of a projection map (reference ``projections/base.py:8-12``).

    ``indices`` are global column (entity) indices the projection applies to.
    """

    proj_type: str = ""
    proj_params: dict = field(default_factory=dict)
    indices: list = field(default_factory=list)


class ProjectionOperator(ABC):
    """Base class for projection operators (reference ``projections/base.py:15-36``).

    Subclasses precompute state in ``__init__`` (all static Python values) and
    apply the projection in ``__call__`` along the last axis.  ``__call__``
    must be traceable (pure jnp ops, no data-dependent Python control flow).
    """

    @abstractmethod
    def __init__(self, **params):
        ...

    @abstractmethod
    def __call__(self, x: Array) -> Array:
        ...


_registry: Dict[str, type] = {}


def register(name: str):
    """Class decorator registering a projection under ``name``
    (reference ``projections/base.py:43-48``)."""

    def decorator(cls):
        _registry[name] = cls
        return cls

    return decorator


def project(name: str, **params) -> ProjectionOperator:
    """Instantiate a projection operator by registry name
    (reference ``projections/base.py:51-57``)."""
    if name not in _registry:
        raise ValueError(f"Unknown projection operator '{name}'")
    return _registry[name](**params)


def registered_projections() -> List[str]:
    return sorted(_registry)


def create_projection_map(
    proj_type: str,
    proj_params: Dict[str, float],
    num_indices: int,
    indices: Union[List[int], None] = None,
    key_prefix: str = "",
) -> Dict[str, ProjectionEntry]:
    """Build a single-entry projection map (reference ``projections/base.py:60-97``).

    The auto-generated key is ``f"{prefix}{type}_{param}_{value}..."`` with
    params sorted by name, exactly as in the reference.
    """
    if indices is None:
        indices = list(range(num_indices))

    param_str = "_".join(f"{k}_{v}" for k, v in sorted(proj_params.items()))
    key = f"{key_prefix}{proj_type}_{param_str}" if key_prefix else f"{proj_type}_{param_str}"

    return {key: ProjectionEntry(proj_type=proj_type, proj_params=proj_params, indices=indices)}
