"""dualip_tpu: a TPU-native, extreme-scale structured LP solver in JAX.

Ground-up rebuild of linkedin/DuaLip (reference mounted at /root/reference):
ridge-regularized dual ascent where every dual-gradient evaluation solves all
block-separable primal subproblems as batched Euclidean projections, the
sparse gradient assembly is a segment-sum over static BlockCSC tiles, and the
outer Nesterov loop runs as a jit-compiled lax.scan sharded over an entity
mesh.  See SURVEY.md for the structural map of the reference.
"""

__version__ = "0.1.0"

from dualip_tpu.types import (  # noqa: F401
    ComputeArgs,
    ObjectiveArgs,
    ObjectiveResult,
    SolverArgs,
    SolverResult,
)

from dualip_tpu.run_solver import (  # noqa: F401,E402
    build_objective,
    register_objective,
    run_solver,
    transfer_tensors_to_device,
)
