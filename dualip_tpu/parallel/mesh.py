"""Device-mesh helpers for entity-sharded SPMD solves.

The reference's distributed layer was torch.distributed/NCCL with one process
per GPU, reduce-to-rank-0 and broadcast (reference ``matching.py:272-277``,
``agd.py:204-206``).  The TPU equivalent is a 1-D ``jax.sharding.Mesh`` over
all chips (ICI within a slice, DCN across hosts — transparent to XLA
collectives): tiles shard along the entity axis, duals replicate, and the
per-iteration communication is a single all-reduce of the (m,) gradient and
two scalars (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

ENTITY_AXIS = "entities"


def default_mesh(n_devices: Optional[int] = None, axis_name: str = ENTITY_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` local devices (default: all)."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else int(n_devices)
    if n > len(devs):
        raise ValueError(f"Requested {n} devices but only {len(devs)} available")
    return Mesh(np.asarray(devs[:n]), (axis_name,))


def entity_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (the entity/K axis of tiles) over the mesh."""
    return NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def initialize_multihost(coordinator_address: Optional[str] = None, **kwargs) -> None:
    """Initialize multi-host JAX (pod slices); no-op for single-process runs.

    Replaces the reference's ``dist.init_process_group("nccl")`` + torchrun
    launch (reference ``run_matching_benchmark_dist.py:35-41``).

    NOTE: must run before anything touches the XLA backend — even
    ``jax.process_count()`` initializes it, after which
    ``jax.distributed.initialize`` refuses to run.  We therefore consult only
    the client-side distributed state, never a backend-initializing call.
    """
    if coordinator_address is None:
        return  # single-process / externally-launched run
    if jax.distributed.is_initialized():
        return  # already initialized (e.g. by the launcher)
    jax.distributed.initialize(coordinator_address=coordinator_address, **kwargs)
