"""Shared loader for the reference checkout used as a test/benchmark oracle.

Single source of truth for the mlflow stub and sys.path handling that
``measure_torch_baseline.py``, ``fuzz_differential.py``, and
``tests/test_differential_reference.py`` all need (the three used to carry
drifting copies).  Nothing here is imported by the library itself.
"""

from __future__ import annotations

import os
import sys
import types
from pathlib import Path

DEFAULT_REFERENCE_PATH = Path(os.environ.get("DUALIP_REFERENCE_PATH", "/root/reference"))


def inject_mlflow_stub() -> None:
    """The reference imports mlflow unconditionally (its utils/mlflow_utils.py:5);
    install a no-op stub when mlflow is absent on this image."""
    try:
        import mlflow  # noqa: F401

        return
    except ImportError:
        pass
    stub = types.ModuleType("mlflow")
    for name in (
        "log_param",
        "log_params",
        "log_metric",
        "log_metrics",
        "set_tracking_uri",
        "set_experiment",
        "start_run",
        "end_run",
        "active_run",
    ):
        setattr(stub, name, lambda *a, **k: None)
    sys.modules["mlflow"] = stub


def reference_available(path: Path | None = None) -> bool:
    path = Path(path) if path is not None else DEFAULT_REFERENCE_PATH
    return (path / "src" / "dualip").exists()


def load_reference(path: Path | None = None) -> types.SimpleNamespace:
    """Import the reference package from its checkout and return handles.

    Returns a namespace with ``torch``, ``matching``, ``miplib``, ``agd``,
    ``proj`` (projections.base), and ``path``.
    """
    path = Path(path) if path is not None else DEFAULT_REFERENCE_PATH
    if not reference_available(path):
        raise FileNotFoundError(f"reference checkout not found at {path}")
    import torch

    inject_mlflow_stub()
    sys.path.insert(0, str(path / "src"))
    try:
        import dualip.objectives.matching as ref_matching
        import dualip.objectives.miplib as ref_miplib
        import dualip.optimizers.agd as ref_agd
        import dualip.projections as ref_projections  # noqa: F401  (registers ops)
        import dualip.projections.base as ref_proj_base
    finally:
        sys.path.remove(str(path / "src"))
    return types.SimpleNamespace(
        torch=torch,
        matching=ref_matching,
        miplib=ref_miplib,
        agd=ref_agd,
        proj=ref_proj_base,
        path=path,
    )
