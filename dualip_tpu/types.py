"""Config and result types for the TPU-native DuaLip solver.

API parity with the reference solver's ``src/dualip/types.py`` (reference
``types.py:7-50``): the same dataclass names and fields are exposed so that a
user of the reference can switch with minimal changes.  Tensors are
``jax.Array`` (or anything array-like) instead of ``torch.Tensor``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Literal, Optional

import jax

Array = jax.Array


@dataclass
class SolverArgs:
    """Solver hyper-parameters (reference ``types.py:7-16``)."""

    max_iter: int = 10000
    initial_step_size: float = 1e-5
    gamma: float = 1e-3
    max_step_size: float = 0.1
    initial_dual_path: Optional[str] = None
    gamma_decay_type: Optional[Literal["step"]] = None
    gamma_decay_params: Optional[dict] = None
    save_primal: bool = False
    # Extension (no reference counterpart): adaptive Nesterov restart —
    # None (reference behavior, golden-traced), "gradient", or "function"
    # (O'Donoghue & Candès 2015; see optimizers/agd.py).  restart_min_spacing
    # rate-limits restarts (minimum iterations between resets) so the schemes
    # stay safe on polyhedral LP duals.
    restart: Optional[Literal["gradient", "function"]] = None
    restart_min_spacing: int = 50
    # Extension: cap iterations per device launch (0 = whole solve is one
    # program).  Chunked launches enqueue asynchronously with no host sync;
    # numerics are bit-identical for chunk >= 2 (chunk=1 compiles to an
    # unrolled program whose fusion differs at the ~1e-5 fp-reassociation
    # level).  Use on shared/preemptible pools whose per-execution watchdog
    # kills long single launches (optimizers/agd.py).
    launch_chunk: int = 0


@dataclass
class ComputeArgs:
    """Compute placement (reference ``types.py:19-22``).

    On TPU the solve is SPMD: ``compute_device_num`` selects how many devices
    of the default mesh participate (entity-sharded data parallelism).
    ``host_device`` is kept for API parity; ``"tpu"``/``"cpu"`` select the JAX
    platform, anything else falls back to the default backend.
    """

    host_device: str = "tpu"
    compute_device_num: int = 1


@dataclass
class ObjectiveArgs:
    """Objective selection (reference ``types.py:25-29``)."""

    objective_type: Literal["miplib2017", "matching"] = "matching"
    use_jacobi_precondition: bool = False
    objective_kwargs: Optional[Dict[str, Any]] = None


@dataclass
class ObjectiveResult:
    """Per-evaluation outputs of an objective (reference ``types.py:32-41``).

    All fields are 0-d or 1-d ``jax.Array``s living on device; fetch with
    ``float(...)``/``np.asarray`` only when needed (the reference forced a
    device sync every iteration, ``agd.py:167`` — we do not).
    """

    dual_gradient: Array
    dual_objective: Array
    reg_penalty: Optional[Array] = None
    primal_objective: Optional[Array] = None
    primal_var: Optional[Any] = None
    dual_val_times_grad: Optional[Array] = None
    max_pos_slack: Optional[Array] = None
    sum_pos_slack: Optional[Array] = None


def _objective_result_flatten(r: "ObjectiveResult"):
    children = (
        r.dual_gradient,
        r.dual_objective,
        r.reg_penalty,
        r.primal_objective,
        r.primal_var,
        r.dual_val_times_grad,
        r.max_pos_slack,
        r.sum_pos_slack,
    )
    return children, None


# Registered as a pytree so an ObjectiveResult can flow through jit/scan
# boundaries directly (None fields flatten to empty subtrees).
jax.tree_util.register_pytree_node(
    ObjectiveResult,
    _objective_result_flatten,
    lambda aux, ch: ObjectiveResult(*ch),
)


@dataclass
class SolverResult:
    """Final solver output (reference ``types.py:44-50``)."""

    dual_val: Array
    dual_objective: float
    objective_result: ObjectiveResult
    dual_objective_log: List[float] = field(default_factory=list)
    step_size_log: List[float] = field(default_factory=list)
