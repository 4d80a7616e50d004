"""BlockCSC: the device-side tile layout for block-separable LPs.

The TPU-native replacement for the reference's flat-CSC hot path.  The
reference kept A in torch CSC and, every iteration, gathered ragged column
slices into zero-padded ``(L, K)`` blocks grouped by power-of-2 nnz buckets
(reference ``matching.py:87-114`` + ``sparse_utils.py:133-220``).  Under XLA
shapes must be static anyway — so we do that bucketing **once at ingestion**
and store the problem directly as dense padded tiles:

    Tile(rows, a, c, length, col_ids)  with  rows/a/c : (K, L)

* ``K`` = number of entity columns in the (projection-entry × nnz-bucket)
  group, ``L`` = max nnz of any column in the bucket (≤ its power-of-2 upper
  threshold, matching reference ``matching.py:93-104``).
* Padding lanes carry ``a = c = 0`` and ``rows = 0``; the projection sees the
  zero padding exactly like the reference's padded blocks
  (``sparse_utils.py:207-211``), and padded lanes are re-masked to zero
  afterwards, mirroring the valid-only scatter-back (``sparse_utils.py:214``).
* Each column belongs to exactly one tile; per-iteration work becomes a fused
  gather → FMA → batched projection → masked ``segment_sum`` over each tile —
  all static-shape, all fusible by XLA, vmapped "for free" over K.

Sharding: tiles shard along K (the entity axis).  ``pad_cols_to`` rounds K up
so ``shard_map`` can split it evenly over the device mesh; padding columns
have ``length = 0`` and contribute exactly zero.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dualip_tpu.projections.base import ProjectionEntry, project
from dualip_tpu.sparse.csc import CSCMatrix, same_pattern

Array = jax.Array


class Tile(NamedTuple):
    """One (projection-entry × nnz-bucket) group of entity columns.

    All members are arrays (a JAX pytree); static metadata lives in TileSpec.
    """

    rows: Array  # (K, L) uint16 (m ≤ 65535) | int32 — constraint-row index (0 on padding)
    a: Array  # (K, L) — A values (0 on padding)
    c: Array  # (K, L) — c values (0 on padding)
    length: Array  # (K,) int32 — valid nnz per column (0 for padding columns)
    col_ids: Array  # (K,) int32 — global column id (-1 for padding columns)


@dataclass(frozen=True)
class TileSpec:
    """Static (host-side) metadata for one tile."""

    entry_key: str
    proj_type: str
    proj_params: Tuple[Tuple[str, float], ...]  # sorted, hashable
    K: int
    L: int
    # Host-only map tile position -> flat CSC nnz index (for primal scatter-back).
    flat_idx: Optional[np.ndarray] = field(default=None, compare=False, repr=False)

    def projection(self):
        return project(self.proj_type, **dict(self.proj_params))


@dataclass
class BlockCSC:
    """A block-separable LP's (A, c) pair in tile form.

    ``tiles`` is a list of Tile pytrees (device or host arrays); ``specs``
    carries the matching static metadata.  ``m``/``n``/``nnz`` are the
    original CSC dimensions.
    """

    tiles: List[Tile]
    specs: List[TileSpec]
    m: int
    n: int
    nnz: int

    def tree_flatten(self):
        return (self.tiles,), (self.specs, self.m, self.n, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        specs, m, n, nnz = aux
        return cls(tiles=list(children[0]), specs=specs, m=m, n=n, nnz=nnz)


jax.tree_util.register_pytree_node(
    BlockCSC, BlockCSC.tree_flatten, lambda aux, ch: BlockCSC.tree_unflatten(aux, ch)
)


def _pow2_thresholds(max_nnz: int) -> np.ndarray:
    """Reference bucket boundaries: [0, 2, 4, ..., 2^k <= max_nnz, max_nnz+1]
    (reference ``matching.py:93-99``)."""
    th = [0]
    p = 2
    while p <= max_nnz:
        th.append(p)
        p *= 2
    th.append(max_nnz + 1)
    return np.asarray(th, dtype=np.int64)


def _geom_thresholds(max_nnz: int, ratio: float = 1.05) -> np.ndarray:
    """Geometric bucket boundaries with per-bucket padding bounded by
    ``ratio - 1`` instead of the pow2 rule's up-to-2x — the compact layout's
    row-side bucketing (at the canonical row-degree skew this takes the row
    slot ratio from 1.44x to ~1.02x of nnz)."""
    th = [0]
    v = 1
    while v <= max_nnz:
        th.append(v)
        v = max(v + 1, int(np.ceil(v * ratio)))
    th.append(max_nnz + 1)
    return np.unique(np.asarray(th, dtype=np.int64))


def _exact_thresholds(lengths: np.ndarray) -> np.ndarray:
    """One bucket per distinct column degree: zero within-bucket padding.
    Practical when the degree support is small (the canonical matching
    workload has only ~34 distinct column degrees)."""
    uniq = np.unique(lengths[lengths > 0]).astype(np.int64)
    return np.concatenate([[0], uniq, [uniq[-1] + 1] if uniq.size else [1]])


def _build_tile(
    A: CSCMatrix,
    C: CSCMatrix,
    cols: np.ndarray,
    entry_key: str,
    proj_type: str,
    proj_params: Dict,
    pad_cols_to: int,
    keep_flat_idx: bool,
    dtype,
) -> Tuple[Tile, TileSpec]:
    lens = A.col_lengths[cols].astype(np.int64)
    K_valid = len(cols)
    K = -(-K_valid // pad_cols_to) * pad_cols_to
    L = int(lens.max())
    # Row ids fit uint16 whenever m ≤ 65535 (the canonical benchmark's
    # m = 10^4 qualifies): −2 B/nnz-slot on every tile read of the csc /
    # pallas hot paths and on host/HBM residency (VERDICT r2 #4).
    rows_dtype = np.uint16 if A.shape[0] <= np.iinfo(np.uint16).max else np.int32

    # Native parallel fill when the C++ data-plane is available (identical
    # output to the numpy path below; see native/dualip_native.cc).
    if K_valid * L >= 1 << 20:
        from dualip_tpu.io.native_loader import fill_tile_native

        native = fill_tile_native(
            A.indptr, A.row_indices, A.data, C.data, cols, K, L, keep_flat_idx
        )
        if native is not None:
            rows, a, c, length, col_ids, flat_idx = native
            spec = TileSpec(
                entry_key=entry_key,
                proj_type=proj_type,
                proj_params=tuple(sorted(proj_params.items())),
                K=K,
                L=L,
                flat_idx=flat_idx,
            )
            return (
                Tile(
                    rows=rows.astype(rows_dtype, copy=False),
                    a=a.astype(dtype),
                    c=c.astype(dtype),
                    length=length,
                    col_ids=col_ids,
                ),
                spec,
            )

    starts = A.indptr[cols]
    total = int(lens.sum())
    cols_rep = np.repeat(np.arange(K_valid), lens)
    prefix = np.cumsum(lens) - lens
    idx_in_col = np.arange(total) - prefix[cols_rep]
    flat = starts[cols_rep] + idx_in_col

    rows = np.zeros((K, L), dtype=rows_dtype)
    a = np.zeros((K, L), dtype=dtype)
    c = np.zeros((K, L), dtype=dtype)
    rows[cols_rep, idx_in_col] = A.row_indices[flat]
    a[cols_rep, idx_in_col] = A.data[flat]
    c[cols_rep, idx_in_col] = C.data[flat]

    length = np.zeros(K, dtype=np.int32)
    length[:K_valid] = lens
    col_ids = np.full(K, -1, dtype=np.int32)
    col_ids[:K_valid] = cols

    flat_idx = None
    if keep_flat_idx:
        flat_idx = np.full((K, L), -1, dtype=np.int64)
        flat_idx[cols_rep, idx_in_col] = flat

    spec = TileSpec(
        entry_key=entry_key,
        proj_type=proj_type,
        proj_params=tuple(sorted(proj_params.items())),
        K=K,
        L=L,
        flat_idx=flat_idx,
    )
    return Tile(rows=rows, a=a, c=c, length=length, col_ids=col_ids), spec


def build_blockcsc(
    A: CSCMatrix,
    C: CSCMatrix,
    projection_map: Dict[str, ProjectionEntry],
    batching: bool = True,
    pad_cols_to: int = 1,
    keep_flat_idx: bool = True,
    dtype=np.float32,
    bucketing: str = "pow2",
) -> BlockCSC:
    """Bucket the columns of same-pattern (A, c) into projection tiles.

    ``batching=True`` groups each projection entry's columns by nnz buckets
    (reference ``matching.py:74-77``); ``batching=False`` keeps one
    tile per entry padded to the entry's global max nnz.  ``bucketing``
    selects the bucket boundaries: ``"pow2"`` (the reference rule) or
    ``"exact"`` (one bucket per distinct degree — zero within-tile slot
    padding, the compact butterfly layout's column rule).

    Columns not covered by any entry get the identity projection (the
    reference left them untouched — or clobbered them through its preallocated
    output buffer, SURVEY.md §2.6; identity is the sane, equivalent choice for
    the covered-in-one-entry workloads both solvers target).
    """
    if not same_pattern(A, C):
        raise ValueError("A and c must share the same CSC sparsity pattern")
    m, n = A.shape
    lengths = A.col_lengths
    # Empty columns carry no variables; they are dropped from the tiles,
    # matching the reference where nnz-bucketing silently excludes them
    # (a 0-length column lands below the first power-of-2 bucket,
    # reference matching.py:102-113).
    has_empty = bool((lengths == 0).any())

    if bucketing == "exact":
        thresholds = _exact_thresholds(lengths)
    elif bucketing == "pow2":
        thresholds = _pow2_thresholds(m)
    else:
        raise ValueError(f"Unknown bucketing {bucketing!r} (expected 'pow2' or 'exact')")
    # torch.bucketize(right=False): index i s.t. th[i-1] < len <= th[i]
    bucket_ids = np.searchsorted(thresholds, lengths, side="left")

    covered = np.zeros(n, dtype=bool)
    tiles: List[Tile] = []
    specs: List[TileSpec] = []

    def add_entry(entry_key: str, proj_type: str, proj_params: Dict, indices: np.ndarray):
        if has_empty and len(indices):
            indices = indices[lengths[indices] > 0]
        if len(indices) == 0:
            return
        if batching:
            ids = bucket_ids[indices]
            for j in range(1, len(thresholds)):
                cols = indices[ids == j]
                if len(cols) == 0:
                    continue
                t, s = _build_tile(
                    A, C, cols, entry_key, proj_type, proj_params, pad_cols_to, keep_flat_idx, dtype
                )
                tiles.append(t)
                specs.append(s)
        else:
            t, s = _build_tile(
                A, C, indices, entry_key, proj_type, proj_params, pad_cols_to, keep_flat_idx, dtype
            )
            tiles.append(t)
            specs.append(s)

    for key, entry in projection_map.items():
        idx = np.asarray(entry.indices, dtype=np.int64)
        if covered[idx].any():
            raise ValueError(f"Projection entry '{key}' overlaps a previously covered column")
        covered[idx] = True
        add_entry(key, entry.proj_type, dict(entry.proj_params), idx)

    uncovered = np.nonzero(~covered)[0]
    add_entry("__identity__", "identity", {}, uncovered)

    return BlockCSC(tiles=tiles, specs=specs, m=m, n=n, nnz=A.nnz)


# ---------------------------------------------------------------------------
# Device-side tile ops
# ---------------------------------------------------------------------------


def tile_valid_mask(tile: Tile, L: int) -> Array:
    """(K, L) bool mask of real (non-padding) entries."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile.length.shape[0], L), 1)
    return lane < tile.length[:, None]


def apply_projections(
    bcsc: BlockCSC, values: Sequence[Array], mask_output: bool = True
) -> List[Array]:
    """Apply each tile's registered projection to its value tile.

    Device analog of the reference's ``apply_F_to_columns``
    (``sparse_utils.py:133-220``): the projection runs over the zero-padded
    block, then padded lanes are zeroed (the valid-only scatter-back).
    """
    out = []
    for tile, spec, v in zip(bcsc.tiles, bcsc.specs, values):
        proj = spec.projection()
        x = proj(v)
        if mask_output:
            x = jnp.where(tile_valid_mask(tile, spec.L), x, jnp.zeros((), dtype=x.dtype))
        out.append(x)
    return out


def tiles_values_to_flat(bcsc: BlockCSC, values: Sequence[np.ndarray]) -> np.ndarray:
    """Scatter per-tile value blocks back to a flat CSC-ordered nnz vector
    (host side; inverse of the tile build).  Requires ``keep_flat_idx=True``."""
    flat = np.zeros(bcsc.nnz, dtype=np.asarray(values[0]).dtype)
    for spec, v in zip(bcsc.specs, values):
        if spec.flat_idx is None:
            raise ValueError("BlockCSC was built with keep_flat_idx=False")
        sel = spec.flat_idx >= 0
        flat[spec.flat_idx[sel]] = np.asarray(v)[sel]
    return flat


def flat_to_tiles_values(bcsc: BlockCSC, flat: np.ndarray, dtype=None) -> List[np.ndarray]:
    """Gather a flat CSC-ordered nnz vector into per-tile value blocks (host)."""
    out = []
    dtype = dtype or np.asarray(flat).dtype
    for spec in bcsc.specs:
        if spec.flat_idx is None:
            raise ValueError("BlockCSC was built with keep_flat_idx=False")
        v = np.zeros((spec.K, spec.L), dtype=dtype)
        sel = spec.flat_idx >= 0
        v[sel] = np.asarray(flat)[spec.flat_idx[sel]]
        out.append(v)
    return out


def device_put_blockcsc(bcsc: BlockCSC, sharding=None) -> BlockCSC:
    """Move all tile arrays to device, optionally sharded along K (axis 0)."""
    if sharding is None:
        tiles = jax.device_put(bcsc.tiles)
    else:
        tiles = jax.device_put(bcsc.tiles, sharding)
    return BlockCSC(tiles=tiles, specs=bcsc.specs, m=bcsc.m, n=bcsc.n, nnz=bcsc.nnz)
