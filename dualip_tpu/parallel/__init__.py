"""Parallelism layer: 1-D entity mesh, shardings, split utilities."""

from dualip_tpu.parallel.mesh import (  # noqa: F401
    ENTITY_AXIS,
    default_mesh,
    entity_sharding,
    initialize_multihost,
    replicated_sharding,
)
from dualip_tpu.parallel.dist_utils import (  # noqa: F401
    global_to_local_projection_map,
    split_tensors_to_devices,
)
from dualip_tpu.parallel.multihost import (  # noqa: F401
    assemble_global_tiles,
    local_matching_shard,
    process_shard_bounds,
)
