"""Objective-function ABCs (parity: reference ``objectives/base.py``).

The reference contract is an eager ``calculate(dual_val, gamma, save_primal,
rank) -> ObjectiveResult`` (reference ``objectives/base.py:19-26``).  The TPU
contract adds the traced form the optimizer actually consumes:

* ``params`` — a pytree of device arrays (problem data) threaded explicitly
  through ``jit``/``lax.scan`` so XLA sees shardable buffers;
* ``calculate_traceable(params, dual_val, gamma) -> ObjectiveResult`` — pure
  and traceable (no host syncs, no Python control flow on traced values).

``calculate`` is derived from ``calculate_traceable`` by default.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Any, Optional

import jax

from dualip_tpu.types import ObjectiveResult

Array = jax.Array


@dataclass
class BaseInputArgs(ABC):
    """Base for objective input dataclasses (reference ``objectives/base.py:7-16``)."""

    def __post_init__(self):
        pass


class BaseObjective(ABC):
    """Base objective (reference ``objectives/base.py:19-26``)."""

    equality_mask: Optional[Array] = None

    @property
    def params(self) -> Any:
        """Pytree of problem data passed to ``calculate_traceable``."""
        return ()

    @abstractmethod
    def calculate_traceable(self, params: Any, dual_val: Array, gamma) -> ObjectiveResult:
        """Pure traced evaluation of gradient/objective at ``dual_val``."""
        ...

    def calculate(
        self,
        dual_val: Array,
        gamma: Optional[float] = None,
        save_primal: bool = False,
        rank: int = 0,
        **kwargs,
    ) -> ObjectiveResult:
        """Eager evaluation (reference signature, ``objectives/base.py:24-26``)."""
        del save_primal, rank, kwargs
        return self.calculate_traceable(self.params, dual_val, gamma)
