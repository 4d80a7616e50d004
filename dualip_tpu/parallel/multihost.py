"""Multi-host input pipeline: per-process entity shards → global sharded tiles.

The reference's distributed setup generated everything on rank 0 and
scattered pickled shards (``run_matching_benchmark_dist.py:43-101``) — a
pattern that cannot scale to pod slices (SURVEY.md §7.3).  Here each host
either

* deterministically generates its own contiguous entity shard (same seed →
  same global problem, sliced by process index), or
* loads its shard from per-host files,

then assembles globally-sharded device arrays with
``jax.make_array_from_process_local_data``.  The dual vector and ``b`` stay
replicated; the per-iteration all-reduce rides ICI/DCN transparently.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from dualip_tpu.objectives.matching import MatchingInputArgs
from dualip_tpu.parallel.dist_utils import global_to_local_projection_map, split_tensors_to_devices
from dualip_tpu.sparse.bcsc import BlockCSC, Tile


def process_shard_bounds(num_cols: int, process_index: Optional[int] = None, process_count: Optional[int] = None) -> Tuple[int, int]:
    """Balanced contiguous [start, end) column range for this process
    (same split rule as ``split_tensors_to_devices``, reference
    ``dist_utils.py:49-66``)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    base, rem = divmod(num_cols, pc)
    start = pi * base + min(pi, rem)
    return start, start + base + (1 if pi < rem else 0)


def local_matching_shard(
    global_args: MatchingInputArgs,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> MatchingInputArgs:
    """Slice the global problem to this process's contiguous entity range.

    Use when every host can (re)generate or memory-map the global CSC; for
    file-per-host pipelines construct the local MatchingInputArgs directly.
    """
    n = global_args.A.shape[1]
    pc = jax.process_count() if process_count is None else process_count
    a_splits, c_splits, index_map = split_tensors_to_devices(
        global_args.A, global_args.c, list(range(pc))
    )
    pi = jax.process_index() if process_index is None else process_index
    local_pm = global_to_local_projection_map(global_args.projection_map, index_map[pi])
    return MatchingInputArgs(
        A=a_splits[pi],
        c=c_splits[pi],
        projection_map=local_pm,
        b_vec=global_args.b_vec,  # replicated
        equality_mask=global_args.equality_mask,
    )


def assemble_global_tiles(
    local_bcsc: BlockCSC,
    mesh: Mesh,
    col_offset: Optional[int] = None,
    global_n: Optional[int] = None,
    global_nnz: Optional[int] = None,
) -> BlockCSC:
    """Turn per-process local tiles into global mesh-sharded device arrays.

    Every process must hold tiles with IDENTICAL specs (entry keys, L, and
    per-process K); build them with the same ``projection_map`` and
    ``pad_cols_to`` so shapes line up.  Tile K axes concatenate across
    processes into the global entity axis.

    ``col_offset`` is this process's global column start (e.g.
    ``process_shard_bounds(global_n)[0]``): with it, ``Tile.col_ids`` become
    global ids as documented; ``global_n``/``global_nnz`` fix the container's
    dimensions (defaults: derived from ``global_n`` when given, else left
    shard-local).  Host-side scatter-back metadata (``spec.flat_idx``) is
    shard-local by construction and is dropped from the assembled specs —
    ``tiles_values_to_flat`` must be run per process on the local BlockCSC.
    """
    axis = mesh.axis_names[0]
    sharding = NamedSharding(mesh, PartitionSpec(axis))
    if col_offset is None and global_n is not None:
        col_offset = process_shard_bounds(global_n)[0]
    global_tiles = []
    for tile, spec in zip(local_bcsc.tiles, local_bcsc.specs):
        def to_global(local_arr):
            local_arr = np.asarray(local_arr)
            global_shape = (local_arr.shape[0] * jax.process_count(),) + local_arr.shape[1:]
            return jax.make_array_from_process_local_data(sharding, local_arr, global_shape)

        col_ids = np.asarray(tile.col_ids)
        if col_offset:
            col_ids = np.where(col_ids >= 0, col_ids + int(col_offset), col_ids)
        global_tiles.append(
            Tile(
                rows=to_global(tile.rows),
                a=to_global(tile.a),
                c=to_global(tile.c),
                length=to_global(tile.length),
                col_ids=to_global(col_ids),
            )
        )
    from dataclasses import replace

    specs = [replace(s, flat_idx=None) for s in local_bcsc.specs]
    return BlockCSC(
        tiles=global_tiles,
        specs=specs,
        m=local_bcsc.m,
        n=global_n if global_n is not None else local_bcsc.n,
        nnz=global_nnz if global_nnz is not None else local_bcsc.nnz,
    )
