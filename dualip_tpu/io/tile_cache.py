"""Device-ready butterfly-layout cache.

At canonical scale (~250M nnz) a warm solve process spent 290-390 s
rebuilding the BlockCSC tiles and the row-major companion layout from the
generator cache even though the Beneš plan was already disk-cached — the
tile fill, the row argsort, and the panel transposes are all O(nnz) host
work that produces EXACTLY the same arrays every time.  This module
persists those arrays once, in the final device-ready form (panel-form a/c,
row ids/lengths, row_pos, specs metadata), as plain ``.npy`` files that
load back via ``np.load(mmap_mode="r")`` — a warm start then stages at
disk/DMA speed with zero recompute.  (Reference analog: the
cache-everything ingestion philosophy of
``benchmark/generate_synthetic_data.py:202-343``.)

Scope: the single-device ``layout="butterfly"`` configuration with
``keep_col_tiles=False`` / ``keep_flat_idx=False`` (the canonical-scale
benchmark shape).  The Beneš plan itself stays in its own cache
(``plan_cache_dir``); ``meta.json`` records which plan file to load, so a
cache hit never re-derives the permutation.

Not pickle: every array is a raw ``.npy`` and the metadata is JSON, so a
corrupted or adversarial cache cannot execute code.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Optional

import numpy as np

CACHE_VERSION = 1


def compute_cache_key(
    A, C, projection_map, pad: int, dtype, explicit: Optional[str], extra: str = ""
) -> str:
    """Cache key for a (problem, layout-options) pair.

    ``explicit`` (caller-supplied, e.g. the synthetic generator's cache key)
    skips hashing the problem data — at 250M nnz the sha1 over rows+values
    costs seconds per process.  Without it the key is a full content hash,
    collision-safe for arbitrary inputs.
    """
    h = hashlib.sha1()
    if explicit is not None:
        h.update(explicit.encode())
        # Explicit keys assert problem identity (data AND projection-map
        # assignment); only entry sizes are folded in as a sanity check.
        idx_id = lambda e: len(e.indices)  # noqa: E731
    else:
        h.update(np.ascontiguousarray(A.indptr).tobytes())
        h.update(np.ascontiguousarray(A.row_indices).tobytes())
        h.update(np.ascontiguousarray(A.data).tobytes())
        h.update(np.ascontiguousarray(C.data).tobytes())
        # Index MEMBERSHIP matters, not just entry size: two problems with
        # identical A/C bytes but different entry→column assignments must
        # not collide (a hit would serve the wrong layout).
        idx_id = lambda e: hashlib.sha1(  # noqa: E731
            np.ascontiguousarray(np.asarray(e.indices)).tobytes()
        ).hexdigest()
    pm = sorted(
        (k, e.proj_type, tuple(sorted(dict(e.proj_params).items())), idx_id(e))
        for k, e in projection_map.items()
    )
    h.update(repr((CACHE_VERSION, pm, pad, np.dtype(dtype).name, A.shape, extra)).encode())
    return h.hexdigest()[:20]


def save_butterfly_state(
    cache_dir, key: str, bcsc, rl, plan_cache_file, n_shards: int = 1
) -> None:
    """Persist the device-ready butterfly state (see module docstring).

    ``rl`` leaves may be jnp or numpy; they are pulled host-side here — call
    on a CPU build (the canonical driver's host-build phase) so this is a
    copy, not a device fetch.

    ``n_shards > 1``: ``rl`` is the STACKED mesh layout
    (``build_row_layout_sharded`` — every leaf carries a leading shard axis)
    and ``plan_cache_file`` is the list of per-shard Beneš plan files; arrays
    persist with their shard axis and the loader re-stacks the per-shard
    plans.  Requires a full (non-``local_range``) build.
    """
    if n_shards > 1:
        plan_files = list(plan_cache_file)
        if len(plan_files) != n_shards or any(p is None for p in plan_files):
            raise ValueError(
                "sharded tile-cache save needs one plan-cache file per shard "
                f"(got {plan_files!r} for {n_shards} shards)"
            )
    d = Path(cache_dir) / f"butterfly_{key}"
    tmp = d.with_name(d.name + ".tmp")
    if tmp.exists():
        import shutil

        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    meta = {
        "version": CACHE_VERSION,
        "m": bcsc.m,
        "n": bcsc.n,
        "nnz": bcsc.nnz,
        "n_shards": n_shards,
        "plan_cache_file": (
            str(plan_cache_file) if n_shards == 1 else [str(p) for p in plan_files]
        ),
        "col_offsets": list(rl.col_offsets),
        "row_shapes": [list(s) for s in rl.row_shapes],
        "col_pack": [list(p) for p in rl.col_pack] if rl.col_pack is not None else None,
        "specs": [
            {
                "entry_key": s.entry_key,
                "proj_type": s.proj_type,
                "proj_params": [[k, v] for k, v in s.proj_params],
                "K": s.K,
                "L": s.L,
            }
            for s in bcsc.specs
        ],
    }
    for i, pt in enumerate(rl.col_tiles_T):
        np.save(tmp / f"panel{i}_a.npy", np.asarray(pt.a))
        np.save(tmp / f"panel{i}_c.npy", np.asarray(pt.c))
        np.save(tmp / f"panel{i}_len.npy", np.asarray(pt.length))
    for i, rt in enumerate(rl.row_tiles):
        np.save(tmp / f"rowtile{i}_ids.npy", np.asarray(rt.row_ids))
        np.save(tmp / f"rowtile{i}_len.npy", np.asarray(rt.length))
    np.save(tmp / "row_pos.npy", np.asarray(rl.row_pos))
    (tmp / "meta.json").write_text(json.dumps(meta))
    if d.exists():  # lost a race to another builder: keep theirs
        import shutil

        shutil.rmtree(tmp)
        return
    try:
        tmp.replace(d)  # atomic publish: no torn cache on interrupt
    except OSError:  # raced: another builder published between the
        import shutil  # exists() check and the rename — keep the winner's

        shutil.rmtree(tmp, ignore_errors=True)


def load_butterfly_state(cache_dir, key: str, use_tpu_kernel: bool):
    """Load a cached butterfly state; returns (bcsc, row_layout) or None.

    Arrays are read mmap-backed and converted with ``jnp.asarray`` exactly
    once (one host→device staging — re-used across every launch; leaving
    them as numpy would re-stage GBs on every jit dispatch).  The Beneš
    plan is packed straight from its own cache's bit-planes
    (``pack_plan_from_planes``), so the (S, N) unpacked masks are never
    materialized.
    """
    d = Path(cache_dir) / f"butterfly_{key}"
    meta_path = d / "meta.json"
    if not meta_path.exists():
        return None
    meta = json.loads(meta_path.read_text())
    if meta.get("version") != CACHE_VERSION:
        return None
    n_shards = int(meta.get("n_shards", 1))
    plan_entry = meta["plan_cache_file"]
    plan_files = (
        [Path(p) for p in plan_entry] if isinstance(plan_entry, list) else [Path(plan_entry)]
    )
    if any(not p.exists() for p in plan_files):
        return None

    import jax

    from dualip_tpu.ops.butterfly import BenesPlan, pack_plan_from_planes
    from dualip_tpu.sparse.bcsc import BlockCSC, TileSpec
    from dualip_tpu.sparse.rowmajor import PanelTile, RowLayout, RowTile

    def _plan_from_file(plan_file):
        pd = np.load(plan_file)
        planes = np.asarray(pd["masks_packed"]).view(np.uint8)
        dists_n = tuple(int(x) for x in pd["dists"])
        n_in, n_out = int(pd["n_in"]), int(pd["n_out"])
        if use_tpu_kernel:
            return pack_plan_from_planes(planes, dists_n, n_in, n_out)
        masks = np.unpackbits(planes, axis=0, count=len(dists_n), bitorder="little")
        return BenesPlan(dists=dists_n, masks=masks.astype(np.int8), n_in=n_in, n_out=n_out)

    plans = [_plan_from_file(p) for p in plan_files]
    if n_shards == 1:
        plan = plans[0]
    else:
        # per-shard plans share static aux (forced N/row_total); stack the
        # mask leaves on a leading shard axis like every other layout leaf
        plan = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *plans)

    import jax.numpy as jnp

    def _ld(name):
        return jnp.asarray(np.load(d / name, mmap_mode="r"))

    specs = [
        TileSpec(
            entry_key=s["entry_key"],
            proj_type=s["proj_type"],
            proj_params=tuple((k, v) for k, v in s["proj_params"]),
            K=s["K"],
            L=s["L"],
        )
        for s in meta["specs"]
    ]
    col_tiles_T = [
        PanelTile(a=_ld(f"panel{i}_a.npy"), c=_ld(f"panel{i}_c.npy"), length=_ld(f"panel{i}_len.npy"))
        for i in range(len(specs))
    ]
    row_shapes = tuple(tuple(s) for s in meta["row_shapes"])
    row_tiles = [
        RowTile(
            a=None,
            c=None,
            row_ids=_ld(f"rowtile{i}_ids.npy"),
            axidx=None,
            length=_ld(f"rowtile{i}_len.npy"),
        )
        for i in range(len(row_shapes))
    ]
    col_pack = meta.get("col_pack")
    rl = RowLayout(
        row_tiles=row_tiles,
        zidx=None,
        row_pos=_ld("row_pos.npy"),
        plan=plan,
        col_tiles_T=col_tiles_T,
        use_tpu_kernel=use_tpu_kernel,
        col_offsets=tuple(meta["col_offsets"]),
        row_shapes=row_shapes,
        col_pack=tuple(tuple(p) for p in col_pack) if col_pack is not None else None,
    )
    bcsc = BlockCSC(tiles=[], specs=specs, m=meta["m"], n=meta["n"], nnz=meta["nnz"])
    return bcsc, rl
