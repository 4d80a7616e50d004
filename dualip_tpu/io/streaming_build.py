"""Streaming host build: device-ready sharded tile cache at O(nnz/shards) RSS.

The round-3 host build materialized the GLOBAL BlockCSC + row layout before
anything hit disk — ~170 B/nnz of peak RSS (84 GB at 500M nnz), a hard wall
well short of the reference scaling grid's 2.5B-nnz row
(``/root/reference/benchmark/run_scaling_benchmark.py:33-56``).  This module
builds the mesh-sharded butterfly layout ONE SHARD AT A TIME straight from
the generator's memmap cache and writes each shard's slice directly into the
device-ready tile cache (``dualip_tpu/io/tile_cache.py``), so peak RSS is
O(nnz / n_shards) + the memmap pages the OS keeps warm:

* pass 0 (stats, O(n + m·S) RAM): column degrees from ``ccol`` diffs; shard
  boundaries = contiguous column ranges; FORCED tile shapes (per-bucket
  column count maxed over shards) and forced row-bucket shapes / padded N —
  the same one-program SPMD contract as ``build_row_layout_sharded``, whose
  forced-shape machinery this reuses.
* pass 1 (per shard): slice the memmap CSC, fill that shard's tiles
  (``bcsc._build_tile`` against the mapped arrays — only tile-sized copies
  materialize), route its own Beneš plan at N_shard ≈ nnz/S (the router's
  RSS — the round-3 hog — now scales with the shard, not the problem), and
  write every leaf into a preallocated ``np.lib.format.open_memmap`` slice
  of the stacked cache arrays.  Shard state is freed before the next shard
  starts.

The published cache entry is byte-compatible with
``tile_cache.load_butterfly_state``'s sharded format, so a mesh solve
warm-starts from it exactly like a slice-built entry.  The shard geometry
differs from ``build_row_layout_sharded`` (contiguous column ranges here vs
per-tile K-slices there) — both are valid SPMD layouts of the same problem;
identical math, different summation grouping (fp reassociation tolerance).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from dualip_tpu.projections.base import ProjectionEntry
from dualip_tpu.sparse.csc import CSCMatrix


def _chunked_diff_lengths(ccol: np.ndarray, chunk: int = 1 << 24) -> np.ndarray:
    n = ccol.shape[0] - 1
    out = np.empty(n, dtype=np.int32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        out[lo:hi] = (ccol[lo + 1 : hi + 1] - ccol[lo:hi]).astype(np.int32)
    return out


def _chunked_row_counts(rows: np.ndarray, lo: int, hi: int, m: int, chunk: int = 1 << 25):
    counts = np.zeros(m, dtype=np.int64)
    for s in range(lo, hi, chunk):
        e = min(s + chunk, hi)
        counts += np.bincount(np.asarray(rows[s:e], dtype=np.int64), minlength=m)
    return counts


def stream_build_sharded_cache(
    mm_dir,
    shape,
    projection_map: Dict[str, ProjectionEntry],
    n_shards: int,
    cache_dir,
    key: str,
    plan_cache_dir,
    dtype=np.float32,
    compact: bool = True,
    pad_cols_to: int = 1024,
    progress=None,
) -> Optional[Path]:
    """Build + publish the sharded butterfly cache entry ``butterfly_<key>``
    from the generator memmap dir (``ccol/rows/a/c/b .npy``).  Returns the
    published path (or the existing one on a key hit).

    ``projection_map`` must partition the columns into elementwise or
    degree-grouped entries exactly as the objective would (the canonical
    workload: one global simplex entry).  ``c`` in the memmap is the RAW
    generator reward; it is negated here, matching
    ``generate_synthetic_matching_input_args``.
    """
    from dualip_tpu.sparse.bcsc import (
        Tile,
        TileSpec,
        _build_tile,
        _exact_thresholds,
        _geom_thresholds,
        _pow2_thresholds,
    )
    from dualip_tpu.sparse.rowmajor import _col_geometry, build_row_layout
    from dualip_tpu.sparse import bcsc as _bcsc_mod

    log = progress or (lambda s: None)
    mm_dir = Path(mm_dir)
    d = Path(cache_dir) / f"butterfly_{key}"
    if (d / "meta.json").exists():
        return d
    tmp = d.with_name(d.name + ".tmp")
    if tmp.exists():
        import shutil

        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)

    ccol = np.load(mm_dir / "ccol.npy", mmap_mode="r")
    rows_mm = np.load(mm_dir / "rows.npy", mmap_mode="r")
    a_mm = np.load(mm_dir / "a.npy", mmap_mode="r")
    c_mm = np.load(mm_dir / "c.npy", mmap_mode="r")
    m, n = int(shape[0]), int(shape[1])
    nnz = int(rows_mm.shape[0])
    if ccol.shape[0] != n + 1:
        raise ValueError(f"ccol has {ccol.shape[0]} entries, expected n+1={n + 1}")

    # ---- pass 0: global stats + forced shapes --------------------------
    log("pass0: column degrees")
    lengths = _chunked_diff_lengths(np.asarray(ccol))
    col_thresholds = (
        _exact_thresholds(lengths) if compact else _pow2_thresholds(m)
    )
    bucket_of_col = np.searchsorted(col_thresholds, lengths, side="left")

    n_loc = -(-n // n_shards)
    shard_ranges = [(s * n_loc, min((s + 1) * n_loc, n)) for s in range(n_shards)]

    # entry → per-bucket forced column count (max over shards, padded)
    entries = list(projection_map.items())
    entry_of_col = np.full(n, -1, dtype=np.int32)
    for ei, (ekey, entry) in enumerate(entries):
        idx = np.asarray(entry.indices, dtype=np.int64)
        if (entry_of_col[idx] >= 0).any():
            raise ValueError(f"Projection entry '{ekey}' overlaps another entry")
        entry_of_col[idx] = ei
    if (entry_of_col < 0)[lengths > 0].any():
        entries.append(("__identity__", ProjectionEntry("identity", {}, [])))
        entry_of_col[(entry_of_col < 0) & (lengths > 0)] = len(entries) - 1

    forced_K: Dict[tuple, int] = {}  # (entry_idx, bucket) -> K
    bucket_L: Dict[tuple, int] = {}
    for lo, hi in shard_ranges:
        le = lengths[lo:hi]
        eo = entry_of_col[lo:hi]
        valid = le > 0
        for ei in range(len(entries)):
            sel = valid & (eo == ei)
            if not sel.any():
                continue
            bids = bucket_of_col[lo:hi][sel]
            for b in np.unique(bids):
                kk = int((bids == b).sum())
                ll = int(le[sel][bids == b].max())
                k0 = forced_K.get((ei, int(b)), 0)
                forced_K[(ei, int(b))] = max(k0, kk)
                bucket_L[(ei, int(b))] = max(bucket_L.get((ei, int(b)), 0), ll)
    tile_keys = sorted(forced_K)
    for tk in tile_keys:
        forced_K[tk] = -(-forced_K[tk] // pad_cols_to) * pad_cols_to

    # row-side forced shapes (same contract as build_row_layout_sharded)
    log("pass0: per-shard row histograms")
    max_count = 1
    per_shard_counts = []
    for lo, hi in shard_ranges:
        c0, c1 = int(ccol[lo]), int(ccol[hi])
        counts = _chunked_row_counts(rows_mm, c0, c1, m)
        per_shard_counts.append(counts)
        if counts.size:
            max_count = max(max_count, int(counts.max()))
    row_thresholds = (
        _geom_thresholds(max_count, 1.05) if compact else _pow2_thresholds(max_count)
    )
    bucket_shapes: Dict[int, tuple] = {}
    for counts in per_shard_counts:
        nz = np.nonzero(counts)[0]
        if nz.size == 0:
            continue
        bo = np.searchsorted(row_thresholds, counts[nz], side="left")
        for b in np.unique(bo):
            sel = bo == b
            R, Lr = int(sel.sum()), int(counts[nz][sel].max())
            R0, Lr0 = bucket_shapes.get(int(b), (0, 0))
            bucket_shapes[int(b)] = (max(R0, R), max(Lr0, Lr))
    del per_shard_counts

    col_total = 0
    for tk in tile_keys:
        L2, _, BP = _col_geometry(forced_K[tk], bucket_L[tk], compact)
        col_total += BP * L2 * 128
    row_total = sum(R * Lr for R, Lr in bucket_shapes.values())
    N = 1 << int(np.ceil(np.log2(max(col_total, row_total, 2))))
    forced = {"thresholds": row_thresholds, "bucket_shapes": bucket_shapes, "N": N}
    log(
        f"pass0 done: {len(tile_keys)} tiles, col_total={col_total}, "
        f"row_total={row_total}, N={N}"
    )

    # ---- pass 1: per-shard build, streamed into the stacked cache ------
    from numpy.lib.format import open_memmap

    out_arrays = {}  # name -> (memmap, expected per-shard shape)

    def _sink(name, shard_idx, arr):
        arr = np.asarray(arr)
        if name not in out_arrays:
            mmap = open_memmap(
                tmp / f"{name}.npy", mode="w+", dtype=arr.dtype,
                shape=(n_shards,) + arr.shape,
            )
            out_arrays[name] = mmap
        out_arrays[name][shard_idx] = arr

    plan_files = []
    specs_meta = None
    layout_meta = None
    for s, (lo, hi) in enumerate(shard_ranges):
        log(f"shard {s}/{n_shards}: columns [{lo}, {hi})")
        c0, c1 = int(ccol[lo]), int(ccol[hi])
        indptr_s = (np.asarray(ccol[lo : hi + 1]) - c0).astype(np.int64)
        A_s = CSCMatrix(
            indptr=indptr_s,
            row_indices=rows_mm[c0:c1],
            data=a_mm[c0:c1],
            shape=(m, hi - lo),
        )
        C_s = CSCMatrix(
            indptr=indptr_s,
            row_indices=A_s.row_indices,
            data=-np.asarray(c_mm[c0:c1], dtype=dtype),
            shape=(m, hi - lo),
        )
        le = lengths[lo:hi]
        eo = entry_of_col[lo:hi]
        bid = bucket_of_col[lo:hi]
        tiles, specs = [], []
        for ei, b in tile_keys:
            cols = np.nonzero((eo == ei) & (bid == b) & (le > 0))[0]
            ekey, entry = entries[ei]
            K_f, L_f = forced_K[(ei, b)], bucket_L[(ei, b)]
            if cols.size == 0:
                # this shard has no columns in the bucket: an all-padding tile
                rdt = np.uint16 if m <= np.iinfo(np.uint16).max else np.int32
                t = Tile(
                    rows=np.zeros((K_f, L_f), rdt),
                    a=np.zeros((K_f, L_f), dtype),
                    c=np.zeros((K_f, L_f), dtype),
                    length=np.zeros(K_f, np.int32),
                    col_ids=np.full(K_f, -1, np.int32),
                )
                sp = TileSpec(
                    entry_key=ekey, proj_type=entry.proj_type,
                    proj_params=tuple(sorted(dict(entry.proj_params).items())),
                    K=K_f, L=L_f, flat_idx=None,
                )
                tiles.append(t)
                specs.append(sp)
                continue
            t, sp = _build_tile(
                A_s, C_s, cols, ekey, entry.proj_type, dict(entry.proj_params),
                pad_cols_to=K_f,  # pads K to the forced count
                keep_flat_idx=False, dtype=dtype,
            )
            if t.a.shape[0] != K_f:
                raise AssertionError(f"tile K {t.a.shape[0]} != forced {K_f}")
            if sp.L != L_f:
                # pad lanes to the forced bucket L so shapes agree across shards
                padL = L_f - sp.L
                t = t._replace(
                    rows=np.pad(np.asarray(t.rows), ((0, 0), (0, padL))),
                    a=np.pad(np.asarray(t.a), ((0, 0), (0, padL))),
                    c=np.pad(np.asarray(t.c), ((0, 0), (0, padL))),
                )
                sp = TileSpec(
                    entry_key=sp.entry_key, proj_type=sp.proj_type,
                    proj_params=sp.proj_params, K=sp.K, L=L_f, flat_idx=None,
                )
            tiles.append(t)
            specs.append(sp)
        shard_bcsc = _bcsc_mod.BlockCSC(tiles=tiles, specs=specs, m=m, n=n, nnz=nnz)
        rl = build_row_layout(
            shard_bcsc, method="butterfly", plan_cache_dir=plan_cache_dir,
            _forced=forced, compact=compact,
            # arrays + plan-file references are all that get persisted; the
            # in-memory plan would cost 2 unpacked (S, N) copies per shard
            materialize_plan=False,
        )
        plan_files.append(rl.plan_cache_path)
        if specs_meta is None:
            specs_meta = [
                {
                    "entry_key": sp.entry_key,
                    "proj_type": sp.proj_type,
                    "proj_params": [[k, v] for k, v in sp.proj_params],
                    "K": sp.K,
                    "L": sp.L,
                }
                for sp in specs
            ]
            layout_meta = {
                "col_offsets": list(rl.col_offsets),
                "row_shapes": [list(x) for x in rl.row_shapes],
                "col_pack": [list(p) for p in rl.col_pack]
                if rl.col_pack is not None
                else None,
            }
        for i, pt in enumerate(rl.col_tiles_T):
            _sink(f"panel{i}_a", s, pt.a)
            _sink(f"panel{i}_c", s, pt.c)
            _sink(f"panel{i}_len", s, pt.length)
        for i, rt in enumerate(rl.row_tiles):
            _sink(f"rowtile{i}_ids", s, rt.row_ids)
            _sink(f"rowtile{i}_len", s, rt.length)
        _sink("row_pos", s, rl.row_pos)
        del tiles, specs, shard_bcsc, rl, A_s, C_s
    for mmap in out_arrays.values():
        mmap.flush()
    out_arrays.clear()

    if any(p is None for p in plan_files):
        raise ValueError("plan_cache_dir must be set (Beneš plans are cache-referenced)")

    from dualip_tpu.io.tile_cache import CACHE_VERSION

    meta = {
        "version": CACHE_VERSION,
        "m": m,
        "n": n,
        "nnz": nnz,
        "n_shards": n_shards,
        "plan_cache_file": [str(p) for p in plan_files],
        "specs": specs_meta,
        **layout_meta,
    }
    (tmp / "meta.json").write_text(json.dumps(meta))
    if d.exists():
        import shutil

        shutil.rmtree(tmp)
        return d
    try:
        tmp.replace(d)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return d
