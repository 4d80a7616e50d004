"""Worker for the TRUE two-process multihost test.

Launched as ``python -m tests.distributed._multihost_worker <pid> <nproc>
<port> <out.json>`` by ``test_multihost_two_process.py``.  Each process owns
2 virtual CPU devices; collectives run over Gloo via ``jax.distributed`` —
the same multi-controller runtime a TPU pod slice uses (one JAX process per
host), which single-process virtual-device tests cannot exercise.

Two construction paths are validated against the Scala golden trace:

1. replicated-host construction — every process holds the global problem and
   the objective ctor's ``device_put`` distributes it over the global mesh;
2. per-host shard assembly — each process builds ONLY its local entity shard
   (``local_matching_shard``) and contributes it via
   ``assemble_global_tiles`` / ``jax.make_array_from_process_local_data``
   (the pod-scale input pipeline, ``dualip_tpu/parallel/multihost.py``).
"""

from __future__ import annotations

import json
import sys


def main():
    pid, nproc, port, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]

    import jax

    # sitecustomize imports jax at startup, so env-var routes are already
    # consumed (CLAUDE.md); use the config knobs before first backend use.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from dualip_tpu.objectives.matching import (
        MatchingInputArgs,
        MatchingSolverDualObjectiveFunction,
    )
    from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
    from dualip_tpu.parallel import (
        assemble_global_tiles,
        local_matching_shard,
        process_shard_bounds,
    )
    from dualip_tpu.projections import create_projection_map
    from dualip_tpu.sparse import build_blockcsc

    from tests.objectives.test_dualip_matching_simplex import set_up_data_scala

    assert jax.process_count() == nproc and jax.device_count() == 2 * nproc

    A, C, b_vec = set_up_data_scala()
    n = A.shape[1]
    pm = create_projection_map("simplex", {"z": 1}, n)
    mesh = Mesh(np.array(jax.devices()), ("entities",))
    global_args = MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=b_vec)
    dual0 = jnp.asarray(0.1 * np.ones(A.shape[0], np.float32))

    # Path 1: replicated-host construction (ctor device_puts global arrays).
    obj = MatchingSolverDualObjectiveFunction(global_args, gamma=1e-3, mesh=mesh)
    res0 = AcceleratedGradientDescent(max_iter=30, gamma=1e-3).maximize(obj, dual0)
    log0 = [float(v) for v in np.asarray(res0.dual_objective_log)]

    # Path 2: per-host shard assembly (each process builds only its shard).
    local = local_matching_shard(global_args)
    # per-process K must match across processes and the global K must match
    # the mesh-built objective's (pad_cols_to = mesh size there)
    local_bcsc = build_blockcsc(
        local.A, local.c, local.projection_map, pad_cols_to=len(mesh.devices)
    )
    global_bcsc = assemble_global_tiles(
        local_bcsc, mesh, col_offset=process_shard_bounds(n)[0], global_n=n
    )
    obj.bcsc = global_bcsc  # swap in the multihost-assembled tiles
    obj._jit_cache.clear()
    res1 = AcceleratedGradientDescent(max_iter=30, gamma=1e-3).maximize(obj, dual0)
    log1 = [float(v) for v in np.asarray(res1.dual_objective_log)]

    # Path 3: the butterfly fast path under the multi-controller runtime —
    # per-shard Benes plans stacked on the sharded leading axis, fused
    # projection under shard_map, one psum (pure-jnp carries on CPU).
    obj_bf = MatchingSolverDualObjectiveFunction(
        global_args, gamma=1e-3, mesh=mesh, layout="butterfly", pallas_block_k=8
    )
    res2 = AcceleratedGradientDescent(max_iter=30, gamma=1e-3).maximize(obj_bf, dual0)
    log2 = [float(v) for v in np.asarray(res2.dual_objective_log)]

    with open(out_path, "w") as f:
        json.dump(
            {
                "process": pid,
                "log_replicated": log0,
                "log_assembled": log1,
                "log_butterfly": log2,
            },
            f,
        )


if __name__ == "__main__":
    main()
