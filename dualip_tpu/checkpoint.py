"""Dual-vector checkpointing / warm start.

Parity: the reference's resilience model is restart-from-dual — callers save
the dual and pass ``SolverArgs.initial_dual_path`` to resume (reference
``types.py:13``, ``run_solver.py:127-132``, README "warm start").  Here the
checkpoint is a plain ``.npz`` holding the dual and, optionally, the
step-size engine's rolling window so a resumed solve re-enters the secant
step-size regime immediately instead of replaying 15 initial-step iterations
(SURVEY.md §5 checkpoint/resume)."""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from dualip_tpu.optimizers.agd_utils import StepSizeState


def save_dual(path: str, dual_val, step_size_state: Optional[StepSizeState] = None) -> None:
    arrays = {"dual_val": np.asarray(dual_val)}
    if step_size_state is not None:
        arrays["grad_hist"] = np.asarray(step_size_state.grad_hist)
        arrays["dual_hist"] = np.asarray(step_size_state.dual_hist)
        arrays["count"] = np.asarray(step_size_state.count)
    np.savez(Path(path), **arrays)


def load_dual(path: str) -> Tuple[np.ndarray, Optional[StepSizeState]]:
    """Load a warm-start checkpoint.

    Accepts this package's ``.npz`` (optionally with the step-size window)
    AND reference-style torch checkpoints (``torch.save(dual_tensor, path)``,
    reference ``run_solver.py:127-131``) so existing DuaLip deployments can
    reuse their saved duals directly.
    """
    p = Path(path)
    if not p.exists() and p.with_suffix(p.suffix + ".npz").exists():
        p = p.with_suffix(p.suffix + ".npz")
    if p.suffix in (".pt", ".pth"):
        return _load_torch_dual(p), None
    try:
        loaded = np.load(p)  # missing-file / permission errors propagate
    except (ValueError, OSError) as np_err:
        # not a numpy archive (e.g. torch's legacy pickle format)
        if isinstance(np_err, FileNotFoundError):
            raise
        return _load_torch_dual(p), None
    if isinstance(loaded, np.ndarray):
        return loaded, None  # plain np.save'd dual
    with loaded as data:
        if "dual_val" not in data.files:
            # a zip archive without our key: torch.save files are also zips
            # np.load can open but not parse — hand off to the torch loader.
            return _load_torch_dual(p), None
        dual = data["dual_val"]
        state = None
        if "grad_hist" in data:
            import jax.numpy as jnp

            state = StepSizeState(
                grad_hist=jnp.asarray(data["grad_hist"]),
                dual_hist=jnp.asarray(data["dual_hist"]),
                count=jnp.asarray(data["count"]),
            )
    return dual, state


def _load_torch_dual(p: Path) -> np.ndarray:
    try:
        import torch
    except ImportError as e:
        raise ValueError(
            f"{p} is not an npz checkpoint and torch is unavailable to read a "
            "reference-style torch checkpoint"
        ) from e
    try:
        obj = torch.load(p, map_location="cpu", weights_only=True)
    except TypeError:
        # torch < 1.13 has no weights_only kwarg (the deployments this
        # compatibility path exists for may be pinned that old)
        obj = torch.load(p, map_location="cpu")
    if not isinstance(obj, torch.Tensor):
        raise ValueError(f"{p}: expected a torch tensor dual, got {type(obj).__name__}")
    return obj.detach().numpy()
