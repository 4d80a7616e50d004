"""MLflow observability integration (parity: reference ``utils/mlflow_utils.py``).

Same surface: ``MLflowConfig``, ``mlflow_run_context``, ``log_hyperparameters``
(selective solver/objective param logging), ``log_metrics``,
``log_objective_result``.  All operations are graceful no-ops when MLflow is
unavailable or disabled, and exceptions are swallowed so logging can never
crash a solve (reference ``mlflow_utils.py:85-87, 112-113, 172-173``).

TPU note: callers should feed metrics from device logs in chunks — never
force a device sync per iteration (reference defect SURVEY.md §2.6.6); the
AGD maximizer already batches its metric fetches.
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass
from typing import Any, Dict, Optional, Set, Union

import numpy as np


def is_mlflow_available() -> bool:
    try:
        import mlflow  # noqa: F401

        return True
    except ImportError:
        return False


@dataclass
class MLflowConfig:
    """Reference ``mlflow_utils.py:11-21``."""

    enabled: bool
    tracking_uri: str = ""
    experiment_name: str = ""
    run_name: str = ""
    log_hyperparameters: bool = True
    log_metrics: bool = True
    synchronous: bool = False


class MLflowState:
    """Process-global logging state (reference ``mlflow_utils.py:25-52``)."""

    def __init__(self):
        self.config: Optional[MLflowConfig] = None
        self.active_run = None
        self._enabled = False

    def set_config(self, config: MLflowConfig):
        self.config = config
        self._enabled = config.enabled and is_mlflow_available()

    def is_enabled(self) -> bool:
        return self._enabled and self.config is not None

    def set_active_run(self, run):
        self.active_run = run


_mlflow_state = MLflowState()


@contextmanager
def mlflow_run_context(config: MLflowConfig):
    """Set up an MLflow experiment/run; no-op when disabled/unavailable
    (reference ``mlflow_utils.py:55-91``)."""
    _mlflow_state.set_config(config)

    if not config.enabled or not is_mlflow_available():
        yield None
        return

    import mlflow

    try:
        if config.tracking_uri:
            mlflow.set_tracking_uri(config.tracking_uri)
        experiment_name = config.experiment_name or "dualip_experiments"
        experiment = mlflow.set_experiment(experiment_name)
        run_name = config.run_name or "dualip_run"
        with mlflow.start_run(run_name=run_name, experiment_id=experiment.experiment_id) as run:
            _mlflow_state.set_active_run(run)
            yield run
    except Exception as e:  # noqa: BLE001 - logging must never crash a solve
        print(f"MLflow logging failed: {e}. Continuing without MLflow logging.")
        yield None
    finally:
        _mlflow_state.set_config(MLflowConfig(enabled=False))
        _mlflow_state.set_active_run(None)


def _log_single_param(key: str, value: Any) -> None:
    import mlflow

    try:
        if isinstance(value, (int, float, str, bool)):
            mlflow.log_param(key, value)
        elif hasattr(value, "size") and np.asarray(value).size == 1:
            mlflow.log_param(key, np.asarray(value).item())
        else:
            mlflow.log_param(key, str(value))
    except Exception as e:  # noqa: BLE001
        print(f"Failed to log parameter {key}: {e}")


_SOLVER_PARAMS_TO_LOG: Set[str] = {"max_iter", "initial_step_size", "max_step_size", "gamma", "gamma_decay_type"}
_OBJECTIVE_PARAMS_TO_LOG: Set[str] = {"objective_type"}


def log_hyperparameters(params: Dict[str, Any], step: Optional[int] = None) -> None:
    """Selective solver/objective hyperparameter logging
    (reference ``mlflow_utils.py:94-149``)."""
    del step
    if not _mlflow_state.is_enabled():
        return
    if not _mlflow_state.config.log_hyperparameters:
        return
    try:
        for key, value in params.items():
            if key == "solver":
                for k, v in value.items():
                    if k in _SOLVER_PARAMS_TO_LOG:
                        _log_single_param(f"solver.{k}", v)
            elif key == "objective":
                for k, v in value.items():
                    if k in _OBJECTIVE_PARAMS_TO_LOG:
                        _log_single_param(f"objective.{k}", v)
    except Exception as e:  # noqa: BLE001
        print(f"Failed to log hyperparameters: {e}")


def log_metrics(metrics: Dict[str, Union[float, int]], step: Optional[int] = None) -> None:
    """Reference ``mlflow_utils.py:152-173``."""
    if not _mlflow_state.is_enabled():
        return
    if not _mlflow_state.config.log_metrics:
        return
    import mlflow

    try:
        for key, value in metrics.items():
            if isinstance(value, (int, float, bool)):
                kwargs = {"step": step} if step is not None else {}
                mlflow.log_metric(key, value, synchronous=_mlflow_state.config.synchronous, **kwargs)
            else:
                arr = np.asarray(value)
                if arr.size == 1:
                    kwargs = {"step": step} if step is not None else {}
                    mlflow.log_metric(key, float(arr), synchronous=_mlflow_state.config.synchronous, **kwargs)
    except Exception as e:  # noqa: BLE001
        print(f"Failed to log metrics: {e}")


def log_objective_result(result, step: Optional[int] = None) -> None:
    """Map ObjectiveResult fields to MLflow metrics
    (reference ``mlflow_utils.py:176-203``)."""
    if not _mlflow_state.is_enabled():
        return
    try:
        metrics = {}
        for name, field in (
            ("dual_objective", result.dual_objective),
            ("primal_objective", result.primal_objective),
            ("regularization_penalty", result.reg_penalty),
            ("max_positive_slack", result.max_pos_slack),
            ("sum_positive_slack", result.sum_pos_slack),
        ):
            if field is not None:
                metrics[name] = float(np.asarray(field))
        if metrics:
            log_metrics(metrics, step)
    except Exception as e:  # noqa: BLE001
        print(f"Failed to log objective result: {e}")
