"""Objective functions (parity: reference ``objectives/``)."""

from dualip_tpu.objectives.base import BaseInputArgs, BaseObjective  # noqa: F401
from dualip_tpu.objectives.matching import (  # noqa: F401
    MatchingInputArgs,
    MatchingSolverDualObjectiveFunction,
    MatchingSolverDualObjectiveFunctionDistributed,
    calc_grad,
    matching_local_parts,
)
from dualip_tpu.objectives.miplib import (  # noqa: F401
    MIPLIB2017ObjectiveFunction,
    MIPLIBInputArgs,
)
