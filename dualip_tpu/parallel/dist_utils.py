"""Entity-sharding utilities (parity: reference ``utils/dist_utils.py``).

These exist for API parity and for multi-host pipelines that pre-split data
per process (per-host sharded loading, SURVEY.md §7.3).  For single-process
multi-device solves you normally don't need them: hand the global problem to
``MatchingSolverDualObjectiveFunction(..., mesh=...)`` and XLA shards it.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from dualip_tpu.projections.base import ProjectionEntry
from dualip_tpu.sparse.csc import CSCMatrix, split_csc_by_cols


def global_to_local_projection_map(
    global_map: Dict[str, ProjectionEntry], local_cols: Sequence[int]
) -> Dict[str, ProjectionEntry]:
    """Remap global column indices to shard-local ones, dropping entries that
    don't touch the shard (reference ``dist_utils.py:9-25``)."""
    global2local = {g: loc for loc, g in enumerate(local_cols)}
    local_map: Dict[str, ProjectionEntry] = {}
    for key, entry in global_map.items():
        local_indices = [global2local[g] for g in entry.indices if g in global2local]
        if local_indices:
            local_map[key] = ProjectionEntry(
                proj_type=entry.proj_type,
                proj_params=entry.proj_params,
                indices=local_indices,
            )
    return local_map


def split_tensors_to_devices(
    a_mat: CSCMatrix, c_mat: CSCMatrix, compute_devices: Sequence
) -> Tuple[List[CSCMatrix], List[CSCMatrix], List[List[int]]]:
    """Balanced contiguous column split of (A, c) (reference
    ``dist_utils.py:28-71``).  ``compute_devices`` only determines the number
    of shards; host-side arrays are returned (device placement is the
    sharding layer's job on TPU)."""
    if not compute_devices:
        num_cols = a_mat.shape[1]
        return [a_mat], [c_mat], [list(range(num_cols))]

    num_devices = len(compute_devices)
    num_cols = a_mat.shape[1]
    base = num_cols // num_devices
    remainder = num_cols % num_devices
    split_sizes = [base + (1 if i < remainder else 0) for i in range(num_devices)]

    split_index_map, start = [], 0
    for size in split_sizes:
        split_index_map.append(list(range(start, start + size)))
        start += size

    return split_csc_by_cols(a_mat, split_sizes), split_csc_by_cols(c_mat, split_sizes), split_index_map
