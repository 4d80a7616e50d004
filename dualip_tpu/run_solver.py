"""Solver entry point (parity: reference ``run_solver.py:74-146``).

``run_solver(input_args, solver_args, compute_args, objective_args,
mlflow_config) -> SolverResult`` with the same orchestration: MLflow context →
objective construction → AGD → warm start → maximize → Jacobi inversion.

Fixes two reference defects (SURVEY.md §2.6.1-2): the multi-device matching
path constructs the distributed objective with a working signature, and the
post-solve Jacobi inversion calls a method that exists.
"""

from __future__ import annotations

from dataclasses import fields
from typing import Optional

import jax.numpy as jnp
import numpy as np

from dualip_tpu.checkpoint import load_dual
from dualip_tpu.objectives.base import BaseInputArgs
from dualip_tpu.objectives.matching import (
    MatchingSolverDualObjectiveFunction,
)
from dualip_tpu.objectives.miplib import MIPLIB2017ObjectiveFunction
from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
from dualip_tpu.types import ComputeArgs, ObjectiveArgs, SolverArgs, SolverResult
from dualip_tpu.utils.mlflow_utils import MLflowConfig, log_hyperparameters, mlflow_run_context


def transfer_tensors_to_device(input_args: BaseInputArgs, device: str) -> BaseInputArgs:
    """API-parity shim (reference ``run_solver.py:17-41``).

    On TPU explicit per-tensor moves are unnecessary — objectives place (and
    shard) their own buffers at construction.  This normalizes array-like
    fields to numpy so downstream ingestion is uniform.
    """
    del device
    field_values = {}
    for f in fields(input_args):
        value = getattr(input_args, f.name)
        field_values[f.name] = value
    return type(input_args)(**field_values)


_OBJECTIVE_REGISTRY: dict = {}


def register_objective(name: str):
    """Register a custom objective factory under ``ObjectiveArgs.objective_type``.

    Extension (the reference hard-codes its two objective types,
    ``run_solver.py:44-71``): completes the operator-centric story at the
    entry point — a new LP formulation plugs into ``run_solver`` without
    touching it.  The factory is called as ``factory(input_args,
    solver_args=..., compute_args=..., mesh=..., **objective_kwargs)`` and
    must return an objective exposing ``equality_mask``, ``params``, and
    ``calculate_traceable`` (see ``objectives/base.py``); ``mesh`` is a
    ``jax.sharding.Mesh`` when ``compute_device_num > 1``, else ``None``.

    Contract: ``input_args`` must be a dataclass (the orchestration's
    ``transfer_tensors_to_device`` reflects over its fields) exposing a
    ``b_vec`` whose length is the dual dimension (used for the cold-start
    zero dual; warm starts via ``initial_dual_path`` bypass it).  Built-in
    names ("matching", "miplib2017") cannot be overridden.
    """

    def deco(factory):
        if name in ("matching", "miplib2017"):
            raise ValueError(f"{name!r} is a built-in objective type")
        _OBJECTIVE_REGISTRY[name] = factory
        return factory

    return deco


def build_objective(
    input_args: BaseInputArgs,
    solver_args: SolverArgs,
    compute_args: ComputeArgs,
    objective_args: ObjectiveArgs,
):
    """Reference ``run_solver.py:44-71`` with the fixed multi-device path."""
    objective_type = objective_args.objective_type
    objective_kwargs = objective_args.objective_kwargs or {}

    mesh = None
    if compute_args.compute_device_num > 1:
        from dualip_tpu.parallel.mesh import default_mesh

        mesh = default_mesh(compute_args.compute_device_num)

    if objective_type in _OBJECTIVE_REGISTRY:
        if objective_args.use_jacobi_precondition:
            raise ValueError(
                "use_jacobi_precondition is not forwarded to registered "
                "objectives; handle preconditioning inside the factory (and "
                "expose invert_jacobi_precondition for the post-solve step)"
            )
        return _OBJECTIVE_REGISTRY[objective_type](
            input_args,
            solver_args=solver_args,
            compute_args=compute_args,
            mesh=mesh,
            **objective_kwargs,
        )

    if objective_type == "miplib2017":
        kwargs = dict(objective_kwargs)
        if objective_args.use_jacobi_precondition:
            kwargs.setdefault("use_jacobi_precondition", True)
        if mesh is not None:
            kwargs.setdefault("mesh", mesh)
        return MIPLIB2017ObjectiveFunction(miplib_input_args=input_args, **kwargs)

    if objective_type == "matching":
        return MatchingSolverDualObjectiveFunction(
            matching_input_args=input_args,
            gamma=solver_args.gamma,
            mesh=mesh,
            **objective_kwargs,
        )

    raise ValueError(
        f"Objective type {objective_type} not supported (registered: "
        f"{['matching', 'miplib2017'] + sorted(_OBJECTIVE_REGISTRY)})"
    )


def run_solver(
    input_args: BaseInputArgs,
    solver_args: SolverArgs,
    compute_args: ComputeArgs,
    objective_args: ObjectiveArgs,
    mlflow_config: Optional[MLflowConfig] = None,
) -> SolverResult:
    """Run one LP solve (reference ``run_solver.py:74-146``)."""
    if mlflow_config is None:
        mlflow_config = MLflowConfig(enabled=False)

    with mlflow_run_context(mlflow_config):
        if mlflow_config.enabled and mlflow_config.log_hyperparameters:
            log_hyperparameters(
                {"solver": solver_args.__dict__, "objective": objective_args.__dict__}
            )

        input_args = transfer_tensors_to_device(input_args, compute_args.host_device)
        objective = build_objective(input_args, solver_args, compute_args, objective_args)

        solver = AcceleratedGradientDescent(
            initial_step_size=solver_args.initial_step_size,
            max_iter=solver_args.max_iter,
            max_step_size=solver_args.max_step_size,
            gamma=solver_args.gamma,
            gamma_decay_type=solver_args.gamma_decay_type,
            gamma_decay_params=solver_args.gamma_decay_params,
            save_primal=solver_args.save_primal,
            restart=solver_args.restart,
            restart_min_spacing=solver_args.restart_min_spacing,
            launch_chunk=solver_args.launch_chunk,
        )

        # Warm start (reference run_solver.py:127-132) + optional step-size
        # window carry from the checkpoint.
        ss_state = None
        if solver_args.initial_dual_path is not None:
            dual0, ss_state = load_dual(solver_args.initial_dual_path)
            initial_dual = jnp.asarray(dual0)
        else:
            initial_dual = jnp.zeros_like(jnp.asarray(np.asarray(input_args.b_vec, dtype=np.float32)))

        solver_result = solver.maximize(objective, initial_dual, initial_step_size_state=ss_state)

        # Post-solve Jacobi inversion (reference run_solver.py:136-144 —
        # fixed: invert_jacobi_precondition exists, miplib.py here).
        if getattr(objective, "use_jacobi_precondition", False):
            inv_dual, inv_grad = objective.invert_jacobi_precondition(
                solver_result.dual_val, solver_result.objective_result.dual_gradient
            )
            solver_result.dual_val = inv_dual
            solver_result.objective_result.dual_gradient = inv_grad

        return solver_result
