"""Row-major companion layout: scatter/gather-free dual-gradient evaluation.

Why this exists (TPU specifics): the column-tile pipeline's two irregular ops
— the per-nnz dual gather ``(-λ/γ)[rows]`` and the ``segment_sum`` scatter of
``a·x`` into the (m,) gradient — dominate the iteration on TPU, where XLA
lowers small-table gathers and scatter-adds to near-serial loops (measured:
together they cost ~3-4× everything else combined; the reference had the same
ops as torch ``index_select``/``scatter_add_``, ``sparse_utils.py:54-85,
223-243``, which CUDA hardware-accelerates but a TPU does not).

The fix is a second, row-major view of the same nonzeros, built once at
ingestion (all indices static):

* **Row tiles** group the nonzeros of each constraint row into dense
  ``(R, Lr)`` blocks (rows bucketed by their nnz with the same power-of-2 rule
  as columns).  In this layout the dual value of a nonzero is constant per
  sublane — ``z = a · scaled[row_id(r)] + (-1/γ)·c`` is a *broadcast*, not a
  gather — and the per-row gradient sum is a dense lane reduction, not a
  scatter.
* The projection still needs the column grouping, so the two layouts are
  connected by **static permutations** applied as plain JAX gathers from
  large flat vectors (fast on TPU, unlike small-table gathers/scatters):
  ``zidx`` carries row-computed z into each column tile; ``axidx`` carries
  column-computed ``a·x`` into the row tiles.

Per iteration the pipeline becomes::

    z_r = a_r * scaled[row_ids][:, None] + (-1/γ) c_r    # dense, per row tile
    z_col[t] = z_cat[zidx[t]]                            # permutation gather 1
    x = Proj(z_col); ax = a_col * x                      # unchanged hot math
    sums_b = Σ_lane ax_cat[axidx[b]]                     # permutation gather 2
    grad = sums_cat[row_pos]                             # (m,) static gather

with zero segment_sums and zero per-nnz table gathers.  Padding slots in
either layout point at a trailing sentinel zero, so the zero-padding
semantics of the column tiles (reference ``sparse_utils.py:207-214``) are
preserved bit-for-bit.

Single-mesh-device only for now: the flat permutations index the *global*
nnz ordering; the mesh-sharded path keeps the psum/segment_sum formulation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class RowTile(NamedTuple):
    """One power-of-2 bucket of constraint rows, row-major.

    Gather mode: ``a``/``c`` are the A/c values of each row's nonzeros (0 on
    padding); ``axidx`` the position of each slot's nonzero in the
    concatenated column-tile ``a·x`` vector (sentinel on padding); z is
    computed here in row space.

    Butterfly mode: ``a``/``c``/``axidx`` are ``None`` — the forward carry
    ships only the masked dual broadcast ``srow = (-λ/γ)[row_id]`` (the
    "srow carry"), and the fused panel kernel computes
    ``z = a·srow + (-1/γ)·c`` from the COLUMN-side a/c it reads anyway, so
    row-space a/c are never stored or streamed (−8 B/nnz resident and
    −8 B/nnz of HBM traffic per iteration vs carrying a precomputed z).
    ``length`` masks the broadcast: padding slots must carry zeros because
    the bijection completion can route them into (ignored, but summed-free)
    column padding slots and back.

    ``row_ids`` is the global constraint-row id per sublane (clamped to 0 on
    padding rows).
    """

    a: Optional[Array]  # (R, Lr) | None (butterfly)
    c: Optional[Array]  # (R, Lr) | None (butterfly)
    row_ids: Array  # (R,) int32
    axidx: Optional[Array]  # (R, Lr) int32 | None (butterfly)
    length: Optional[Array] = None  # (R,) int32 (butterfly) | None (gather)


class PanelTile(NamedTuple):
    """Panel-form a/c of one column tile (butterfly mode only).

    The butterfly col space stores tile ``t`` as ``K/128`` *panels* of
    ``(L2, 128)`` — flat position of column ``k``, lane ``l`` is
    ``off_t + (k>>7)·(128·L2) + l·128 + (k&127)`` with ``L2 = next_pow2(L)``.
    With offsets assigned in descending-``L2`` order, every tile's region of
    the carry buffer is exactly rows ``[off/(128·L2), ·)`` of the free
    *bitcast* view ``buf.reshape(N/(128·L2), L2, 128)`` — so the fused
    projection kernel reads/writes the carry buffer directly (no slices, no
    relayout copies, no ax re-assembly; see ``ops/pallas_matching.py::
    fused_panel_project``).  ``a``/``c`` carry only the L real lanes; the
    ``L2-L`` ghost lanes exist only in the buffer (they carry zeros)."""

    a: Array  # (K//128, L, 128)
    c: Array  # (K//128, L, 128)
    length: Array  # (K//128, 1, 128) int32


def _pack_geometry(L: int, max_l2: int = 512, max_q: int = 64):
    """(L2, q) for the compact column packing: q = L2//L columns of length L
    share one L2-lane buffer row (pow2 L2 keeps the region a whole-row range
    of the free bitcast view, exactly like the plain layout).  Picks the
    smallest pow2 L2 whose waste (L2 - q·L)/L2 drops to ≤ 1/32, else the
    argmin — e.g. L=34 → L2=512, q=15 (0.4% waste); L=1 → L2=1, q=1
    (equivalent slots per column, zero waste at the first candidate).
    Caps: L2 ≤ 512 bounds the kernel block, q ≤ 64 bounds the
    per-kernel unroll."""
    cand = 1 << max(L - 1, 0).bit_length() if L > 1 else 1
    best = None
    while cand <= max_l2 and cand // L <= max_q:
        q = cand // L
        waste = (cand - q * L) / cand
        if best is None or waste < best[0] - 1e-12:
            best = (waste, cand, q)
        if waste <= 1 / 32:
            break
        cand *= 2
    if best is None:  # L > max_l2: one column per pow2 row
        l2 = 1 << max(L - 1, 0).bit_length()
        return l2, 1
    return best[1], best[2]


def _col_geometry(K: int, L: int, compact: bool):
    """Panel-region geometry of one (K, L) column tile: ``(L2, q, BP)`` —
    ``q`` columns of length L per ``L2``-lane buffer row, ``BP`` buffer rows
    (region size = BP·L2·128 flat slots).  Shared by the single-device build
    and the sharded shape pass so forced geometries agree by construction."""
    if compact:
        L2, q = _pack_geometry(L)
    else:
        L2, q = (1 << max(L - 1, 0).bit_length()) if L > 1 else 1, 1
    pr = K // 128  # panel rows (128 columns each)
    BP = -(-pr // q)  # buffer rows (q panel rows share one)
    if q > 1:
        # pad to the panel kernel's bp=8 grid block (see build_row_layout)
        BP = -(-BP // 8) * 8
    return L2, q, BP


@dataclass
class RowLayout:
    """Static companion indices for one BlockCSC (a JAX pytree).

    Gather mode (``method="gather"``): ``zidx[t]`` has the column tile's
    (K, L) shape and indexes the concatenated row-tile z vector (+ trailing
    sentinel zero); ``RowTile.axidx`` carries a·x back.

    Butterfly mode (``method="butterfly"``): ``plan`` is a ``BenesPlan``
    routing row-space → col-space **in panel order** (see ``PanelTile``); the
    same plan applied in reverse carries a·x back (no per-nnz index arrays
    at all).  ``col_tiles_T`` holds the panel-form a/c the fused projection
    kernel reads; ``col_offsets`` the static flat start of each tile's
    region in the carry buffer.

    ``row_pos`` is (m,) and indexes the concatenated per-row sums
    (+ sentinel) to assemble the gradient in both modes.
    """

    row_tiles: List[RowTile]
    zidx: Optional[List[Array]]
    row_pos: Array  # (m,) int32
    plan: Optional[object] = None  # BenesPlan | BenesPlanPacked
    col_tiles_T: Optional[List[PanelTile]] = None  # butterfly mode only
    use_tpu_kernel: bool = False
    col_offsets: Optional[tuple] = None  # static per-tile flat region starts
    row_shapes: Optional[tuple] = None  # static ((R, Lr), ...) per row tile (butterfly)
    # compact packing: static per-tile (L, L2, q) — q columns of length L per
    # L2-lane buffer row (None = plain one-column-per-row panels)
    col_pack: Optional[tuple] = None
    # gather-srow mode (butterfly only): the forward Beneš carry routes the
    # SAME fixed permutation every iteration, so its action on the row-id
    # broadcast is a constant — ``srow_colidx`` (N,) int32 holds, per carry-
    # buffer slot, the constraint-row id whose scaled dual lands there
    # (sentinel m on padding).  One small-table gather
    # ``scaled_pad[srow_colidx]`` then replaces the whole 3-HBM-pass forward
    # carry + its mask reads per iteration, bit-identically (the network does
    # no arithmetic on the payload).  Computed ONCE at objective setup by
    # routing the row-id broadcast through the plan (matching.py).
    srow_colidx: Optional[Array] = None

    def tree_flatten(self):
        children = (
            self.row_tiles, self.zidx, self.row_pos, self.plan, self.col_tiles_T,
            self.srow_colidx,
        )
        aux = (self.use_tpu_kernel, self.col_offsets, self.row_shapes, self.col_pack)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        use_tpu_kernel, col_offsets, row_shapes, col_pack = aux
        row_tiles, zidx, row_pos, plan, col_tiles_T, srow_colidx = children
        return cls(
            row_tiles=list(row_tiles),
            zidx=list(zidx) if zidx is not None else None,
            row_pos=row_pos,
            plan=plan,
            col_tiles_T=list(col_tiles_T) if col_tiles_T is not None else None,
            use_tpu_kernel=use_tpu_kernel,
            col_offsets=col_offsets,
            row_shapes=row_shapes,
            col_pack=col_pack,
            srow_colidx=srow_colidx,
        )


jax.tree_util.register_pytree_node(
    RowLayout, RowLayout.tree_flatten, lambda aux, ch: RowLayout.tree_unflatten(aux, ch)
)


def build_row_layout(
    bcsc,
    method: str = "gather",
    plan_cache_dir=None,
    _forced=None,
    compact: bool = False,
    materialize_plan: bool = True,
) -> RowLayout:
    """Build the row-major companion of a (host-side) BlockCSC.

    Must run on the host tiles (before ``device_put_blockcsc``); all outputs
    are numpy and become device constants/arguments alongside the tiles.

    ``method="gather"`` connects the two layouts with per-nnz index arrays
    (XLA gathers); ``method="butterfly"`` routes one Beneš plan instead (the
    fast TPU path — see ``dualip_tpu/ops/butterfly.py``).  ``plan_cache_dir``
    (butterfly only) caches the routed plan on disk keyed by a hash of the
    permutation — routing is O(N log²N) host work (~30-120 s at N=4M), the
    cache load is seconds.

    ``compact=True`` (butterfly only): the COMPACT packing — q = L2//L
    columns share each pow2 buffer row (``_pack_geometry``) and the row side
    buckets geometrically (1.05x) instead of pow2, shrinking the carry
    buffer to ~1.02-1.05x of nnz.  At the canonical 250M-nnz shape this
    halves N (2^29 → 2^28) and with it every carry pass and mask read.
    Build the BlockCSC with ``bucketing="exact"`` for zero within-tile slot
    padding.  Numerics: identical operands, different summation grouping —
    parity within normal fp32 reassociation tolerance.
    """
    if method not in ("gather", "butterfly"):
        raise ValueError(f"Unknown row-layout method {method!r}")
    if compact and method != "butterfly":
        raise ValueError("compact packing is butterfly-only")
    from dualip_tpu.sparse.bcsc import _geom_thresholds, _pow2_thresholds

    m = bcsc.m

    # --- collect every valid nonzero with its column-flat position ---------
    # Gather mode addresses column space in the tiles' native (K, L) order;
    # butterfly mode uses PANEL order (see ``PanelTile``): tile regions are
    # 128-column panels of L2 = next_pow2(L) lanes, with region offsets
    # assigned in descending-L2 order so every tile region is a whole-row
    # range of the free bitcast view ``buf.reshape(-1, L2, 128)`` — the fused
    # Pallas projection kernel then reads/writes the carry buffer in place
    # (no slices, no relayout copies, no a·x re-assembly).
    transposed = method == "butterfly"
    if transposed:
        KLs = []  # (K, L, L2, q, BP): q cols/buffer-row, BP buffer rows
        for tile in bcsc.tiles:
            K, L = np.asarray(tile.rows).shape
            if K % 128:
                raise ValueError(
                    f"butterfly layout needs tile K divisible by 128 (got K={K}); "
                    "build the BlockCSC with pad_cols_to a multiple of 128"
                )
            # q > 1 buffer rows pad to a multiple of 8 so every region's
            # off0 (in L2-row units) stays a multiple of the panel kernel's
            # bp=8 grid block (plain tiles inherit this from
            # pad_cols_to=1024 -> pr % 8 == 0; packed BP = ceil(pr/q) can
            # land odd otherwise).  Cost: ≤ 7·L2·128 zero slots.
            L2, q, BP = _col_geometry(K, L, compact)
            KLs.append((K, L, L2, q, BP))
        # descending L2, stable: off_t is then always a multiple of 128*L2_t
        order = sorted(range(len(KLs)), key=lambda i: -KLs[i][2])
        col_offsets = [0] * len(KLs)
        cum = 0
        for i in order:
            col_offsets[i] = cum
            cum += KLs[i][4] * KLs[i][2] * 128
        col_total = cum
    # Position dtype: int32 whenever every flat position fits — at 500M nnz
    # the int64 position/permutation arrays alone were ~30 GB of the
    # build's RSS peak (OOM at 130 GB); int32 halves them.  4x headroom
    # covers row_total (≤2x nnz at pow2 row buckets) and the pow2 N.
    _hi = 4 * max(col_total if transposed else 1, bcsc.nnz, m, 2)
    pdt = np.int32 if _hi < 2**31 else np.int64
    rows_dt = np.uint16 if m <= np.iinfo(np.uint16).max else np.int32

    rows_l, a_l, c_l, axflat_l = [], [], [], []
    off = 0
    for i, tile in enumerate(bcsc.tiles):
        rows = np.asarray(tile.rows)
        K, L = rows.shape
        lane = np.arange(L, dtype=pdt)[None, :]
        valid = np.arange(L)[None, :] < np.asarray(tile.length)[:, None]
        if transposed:
            _, _, L2, q, _ = KLs[i]
            kcol = np.arange(K, dtype=pdt)[:, None]
            pr = kcol >> 7  # panel row of column k
            flat = (
                pdt(col_offsets[i])
                + (pr // q) * pdt(128 * L2)
                + ((pr % q) * pdt(L) + lane) * pdt(128)
                + (kcol & 127)
            )
        else:
            flat = off + np.arange(K * L).reshape(K, L)
            # Row-space a/c only exist in gather mode (z computed in row
            # space); butterfly mode ships the srow carry and the panel
            # kernel reads the column-side a/c it streams anyway.
            a_l.append(np.asarray(tile.a)[valid])
            c_l.append(np.asarray(tile.c)[valid])
        rows_l.append(rows[valid])
        axflat_l.append(flat[valid])
        off += K * L
    ax_sentinel = col_total if transposed else off  # trailing zero in the ax concat
    rows_all = np.concatenate(rows_l).astype(rows_dt, copy=False)
    n_nnz = rows_all.size
    del rows_l
    if not transposed:
        a_all = np.concatenate(a_l)
        c_all = np.concatenate(c_l)
    del a_l, c_l
    axflat_all = np.concatenate(axflat_l).astype(pdt, copy=False)
    del axflat_l

    # --- order nonzeros by constraint row (stable: keeps column order) -----
    # (radix sort on the narrow row dtype; positions held in pdt)
    order = np.argsort(rows_all, kind="stable").astype(pdt, copy=False)
    counts = np.bincount(rows_all, minlength=m)
    del rows_all
    nz_rows = np.nonzero(counts)[0]
    row_starts = np.concatenate([[0], np.cumsum(counts[nz_rows])]).astype(pdt, copy=False)

    # ``_forced`` (sharded builds, ``build_row_layout_sharded``): every shard
    # must produce identically-shaped row tiles / plan for SPMD, so the
    # thresholds, per-bucket (R, Lr), and padded N are computed globally and
    # imposed on each shard; shortfall rows/slots are zero padding.
    if _forced is not None:
        thresholds = _forced["thresholds"]
        bucket_shapes = _forced["bucket_shapes"]
        bucket_ids = sorted(bucket_shapes)
    else:
        max_count = int(counts.max()) if counts.size else 1
        # compact: geometric row buckets (≤5% per-bucket padding) instead of
        # the pow2 rule's up-to-2x — the row side must fit the same halved N
        thresholds = (
            _geom_thresholds(max_count, 1.05) if compact else _pow2_thresholds(max_count)
        )
        bucket_shapes = None
        bucket_ids = range(1, len(thresholds))
    bucket_of = np.searchsorted(thresholds, counts[nz_rows], side="left")

    # z-vector flat positions: one (R*Lr) span per row bucket + sentinel
    row_tiles: List[RowTile] = []
    row_shapes: List[tuple] = []
    # position in the z concat for every sorted nonzero
    zpos_sorted = np.empty(n_nnz, dtype=pdt)
    # position of each present row's sum in the sums concat
    sumpos = np.full(m, -1, dtype=np.int64)
    zoff = 0
    sumoff = 0
    for b in bucket_ids:
        sel = np.nonzero(bucket_of == b)[0]  # indices into nz_rows
        if bucket_shapes is not None:
            R, Lr = bucket_shapes[b]
        elif sel.size == 0:
            continue
        else:
            R = sel.size
            Lr = int(counts[nz_rows[sel]].max())
        lens = counts[nz_rows[sel]].astype(np.int64)
        # forced R > sel.size: trailing rows are padding (row_id 0, length 0 —
        # they carry zeros and their sum slot is never referenced by row_pos)
        row_ids_t = np.zeros(R, dtype=np.int32)
        row_ids_t[: sel.size] = nz_rows[sel]
        # vectorized ragged fill (same trick as bcsc._build_tile), pdt-sized
        r_rep = np.repeat(np.arange(sel.size, dtype=pdt), lens)
        prefix = (np.cumsum(lens) - lens).astype(pdt, copy=False)
        l_in_row = np.arange(int(lens.sum()), dtype=pdt) - prefix[r_rep]
        sorted_pos = row_starts[sel][r_rep] + l_in_row  # index into the sorted nnz order
        zpos_sorted[sorted_pos] = pdt(zoff) + r_rep * pdt(Lr) + l_in_row
        sumpos[nz_rows[sel]] = sumoff + np.arange(sel.size)
        if method == "gather":
            src = order[sorted_pos]
            a_t = np.zeros((R, Lr), dtype=a_all.dtype)
            c_t = np.zeros((R, Lr), dtype=c_all.dtype)
            axidx_t = np.full((R, Lr), ax_sentinel, dtype=np.int64)
            a_t[r_rep, l_in_row] = a_all[src]
            c_t[r_rep, l_in_row] = c_all[src]
            axidx_t[r_rep, l_in_row] = axflat_all[src]
            row_tiles.append(
                RowTile(
                    a=jnp.asarray(a_t),
                    c=jnp.asarray(c_t),
                    row_ids=jnp.asarray(row_ids_t),
                    axidx=jnp.asarray(axidx_t.astype(np.int32)),
                )
            )
        else:  # butterfly: srow carry — only row ids + lengths needed
            lens_t = np.zeros(R, dtype=np.int32)
            lens_t[: sel.size] = lens
            row_tiles.append(
                RowTile(
                    a=None,
                    c=None,
                    row_ids=jnp.asarray(row_ids_t),
                    axidx=None,
                    length=jnp.asarray(lens_t),
                )
            )
        row_shapes.append((R, Lr))
        zoff += R * Lr
        sumoff += R
    z_sentinel = zoff

    # rows with no nonzeros point at the sums sentinel (zero gradient)
    row_pos = np.where(sumpos >= 0, sumpos, sumoff).astype(np.int32)

    zpos_all = np.empty(n_nnz, dtype=pdt)
    zpos_all[order] = zpos_sorted
    del order, zpos_sorted

    if method == "butterfly":
        # col_total = Σ K·L2 over column tiles (panel regions, see PanelTile)
        row_total = zoff  # = Σ R·Lr over row tiles
        if _forced is not None:
            N = _forced["N"]
        else:
            N = 1 << int(np.ceil(np.log2(max(col_total, row_total, 2))))
        # σ: row-space → col-space; col padding slots pull zeros from unused
        # row-space / pad slots (bijection completion).  Identity-preferring:
        # a padding column slot whose same-numbered row slot is also unused
        # maps to itself — together with benes_route's identity tail this
        # turns most padding into routing fixed points, which the cycle-
        # walking router short-circuits (docs/performance.md).
        perm = np.full(col_total, -1, dtype=pdt)
        perm[axflat_all] = zpos_all
        del axflat_all
        used = np.zeros(N, dtype=bool)
        used[zpos_all] = True
        del zpos_all
        missing = np.nonzero(perm < 0)[0]
        fix = ~used[missing]
        perm[missing[fix]] = missing[fix]
        used[missing[fix]] = True
        rest = missing[~fix]
        perm[rest] = np.nonzero(~used)[0][: rest.size]
        del used, missing, fix, rest
        use_tpu_kernel = jax.default_backend() == "tpu"
        plan = None
        packed = None  # (planes, dists, n_in, n_out) — the cache/TPU currency
        cache_path = None
        if plan_cache_dir is not None:
            import hashlib
            from pathlib import Path

            # hash the int64 view so keys stay stable across the position
            # dtype (pdt) the builder happens to use (transient copy)
            key = hashlib.sha1(np.ascontiguousarray(perm, dtype=np.int64).tobytes()).hexdigest()[:20]
            # v2: masks stored as bit-planes (8 stages/byte) — the unpacked
            # (2n-1, N) int8 form is 3.3 GB at N=2^26 (30 GB at 2^29)
            cache_path = Path(plan_cache_dir) / f"benes2_{key}_{N}_{row_total}.npz"
            if cache_path.exists():
                d = np.load(cache_path)
                packed = (
                    np.asarray(d["masks_packed"]).view(np.uint8),
                    tuple(int(x) for x in d["dists"]),
                    int(d["n_in"]),
                    int(d["n_out"]),
                )
        if packed is None:
            # Packed-native routing: the stage masks are written straight
            # into bit-planes (8 stages/byte) — the (2n-1, N) int8 form
            # (30.6 GB of transient RSS at the canonical N=2^29) is never
            # materialized (ops/butterfly.py::benes_route_planes).
            from dualip_tpu.ops.butterfly import benes_route_planes

            packed = benes_route_planes(perm, pad_to=N, n_in=row_total)
            if cache_path is not None:
                cache_path.parent.mkdir(parents=True, exist_ok=True)
                tmp = cache_path.with_suffix(".tmp.npz")
                np.savez(
                    tmp,
                    dists=np.asarray(packed[1], dtype=np.int64),
                    masks_packed=packed[0],
                    n_stages=len(packed[1]),
                    n_in=packed[2],
                    n_out=packed[3],
                )
                tmp.replace(cache_path)  # atomic: no corrupt cache on interrupt
        if not materialize_plan:
            # Cache-builder mode (dualip_tpu/io/streaming_build.py): the
            # caller persists arrays + the plan-cache FILE reference and
            # never applies the plan in this process — materializing it
            # here costs up to 2 unpacked (S, N) int8 copies (30 GB/shard
            # at N=2²⁸), the round-4 streaming build's RSS hog.
            if cache_path is None:
                raise ValueError("materialize_plan=False requires plan_cache_dir")
            plan = None
        elif use_tpu_kernel:
            # Split straight from the bit-planes into the coarse/fine form
            # the kernel streams (packing inside the iteration loop would
            # copy the 100 MB-GB-scale mask array on every application; and
            # a warm start never materializes the unpacked (S, N) masks).
            from dualip_tpu.ops.butterfly import pack_plan_from_planes

            plan = pack_plan_from_planes(*packed)
        elif plan is None:  # warm start on CPU: unpack the cached planes
            from dualip_tpu.ops.butterfly import BenesPlan

            planes, dists, p_n_in, p_n_out = packed
            masks = np.unpackbits(planes, axis=0, count=len(dists), bitorder="little")
            plan = BenesPlan(
                dists=dists, masks=masks.astype(np.int8), n_in=p_n_in, n_out=p_n_out
            )
        del packed
        col_tiles_T = []
        for i, t in enumerate(bcsc.tiles):
            a_np, c_np = np.asarray(t.a), np.asarray(t.c)
            K, L = a_np.shape
            _, _, L2, q, BP = KLs[i]
            if q == 1:
                col_tiles_T.append(
                    PanelTile(
                        # (K, L) -> (K//128, L, 128): panel p, lane l, col c = (p*128+c, l)
                        a=jnp.asarray(a_np.reshape(K // 128, 128, L).transpose(0, 2, 1).copy()),
                        c=jnp.asarray(c_np.reshape(K // 128, 128, L).transpose(0, 2, 1).copy()),
                        length=jnp.asarray(np.asarray(t.length).reshape(K // 128, 1, 128)),
                    )
                )
            else:
                # compact: q panel rows stack into each buffer row — arrays
                # become (BP, q*L, 128) / lengths (BP, q, 128); panel rows
                # beyond K//128 (last-buffer-row shortfall) are zeros
                # (length 0: the projection masks them exactly like padding
                # columns)
                pr = K // 128
                pad = BP * q - pr

                def _stack(x):
                    x = x.reshape(pr, 128, L).transpose(0, 2, 1)  # (pr, L, 128)
                    if pad:
                        x = np.concatenate([x, np.zeros((pad, L, 128), dtype=x.dtype)])
                    return np.ascontiguousarray(x.reshape(BP, q * L, 128))

                lens = np.asarray(t.length).reshape(pr, 1, 128)
                if pad:
                    lens = np.concatenate([lens, np.zeros((pad, 1, 128), dtype=lens.dtype)])
                col_tiles_T.append(
                    PanelTile(
                        a=jnp.asarray(_stack(a_np)),
                        c=jnp.asarray(_stack(c_np)),
                        length=jnp.asarray(np.ascontiguousarray(lens.reshape(BP, q, 128))),
                    )
                )
        out = RowLayout(
            row_tiles=row_tiles,
            zidx=None,
            row_pos=jnp.asarray(row_pos),
            plan=plan,
            col_tiles_T=col_tiles_T,
            use_tpu_kernel=use_tpu_kernel,
            col_offsets=tuple(col_offsets),
            row_shapes=tuple(row_shapes),
            col_pack=tuple((L, L2, q) for (_, L, L2, q, _) in KLs) if compact else None,
        )
        # Non-pytree breadcrumb for the device-ready layout cache
        # (dualip_tpu/io/tile_cache.py): which plan-cache file this layout's
        # Beneš routing lives in (None when plan caching is off).
        out.plan_cache_path = str(cache_path) if cache_path is not None else None
        return out

    # --- gather mode: column-tile zidx (where each column slot's z lives) --
    zidx: List[Array] = []
    pos = 0
    for tile in bcsc.tiles:
        rows = np.asarray(tile.rows)
        K, L = rows.shape
        lane = np.arange(L)[None, :]
        valid = lane < np.asarray(tile.length)[:, None]
        zi = np.full((K, L), z_sentinel, dtype=np.int64)
        nvalid = int(valid.sum())
        zi[valid] = zpos_all[pos : pos + nvalid]
        pos += nvalid
        zidx.append(jnp.asarray(zi.astype(np.int32)))

    return RowLayout(
        row_tiles=row_tiles, zidx=zidx, row_pos=jnp.asarray(row_pos),
        row_shapes=tuple(row_shapes),
    )


def _slice_bcsc_cols(bcsc, d: int, n_shards: int):
    """Host view of shard ``d``: columns [d·K/D, (d+1)·K/D) of every tile.

    Requires every tile's K divisible by ``n_shards`` (the objective builds
    with ``pad_cols_to = n_shards·block_k`` in mesh-butterfly mode).
    """
    from dualip_tpu.sparse.bcsc import BlockCSC, Tile

    tiles = []
    for t in bcsc.tiles:
        K = t.a.shape[0]
        if K % n_shards:
            raise ValueError(f"tile K={K} not divisible by {n_shards} shards")
        Kd = K // n_shards
        sl = slice(d * Kd, (d + 1) * Kd)
        tiles.append(
            Tile(rows=t.rows[sl], a=t.a[sl], c=t.c[sl], length=t.length[sl], col_ids=t.col_ids[sl])
        )
    return BlockCSC(tiles=tiles, specs=bcsc.specs, m=bcsc.m, n=bcsc.n, nnz=bcsc.nnz)


def build_row_layout_sharded(
    bcsc, n_shards: int, plan_cache_dir=None, local_range=None, compact: bool = False
) -> RowLayout:
    """Stacked butterfly layouts for an entity-sharded SPMD solve.

    Splits the (host) BlockCSC into ``n_shards`` column shards, builds one
    butterfly row layout per shard under FORCED common shapes (global
    thresholds — pow-2, or geometric when ``compact``; per-bucket (R, Lr) and
    padded N maxed over shards — SPMD needs one program, so per-shard
    differences must live in array DATA, not shapes), and stacks every leaf
    along a new leading shard axis.  Shard the result's leaves on that axis
    over the mesh; inside ``shard_map`` each device squeezes its slice and
    runs the exact single-device pipeline, followed by one psum of
    (grad, obj, reg) — the same communication volume as the csc mesh path
    (SURVEY.md §2.2).

    ``compact=True``: the flagship packing composes with the mesh — each
    shard gets its own compact layout under a COMMON (L, L2, q, BP) geometry
    (``_col_geometry`` is a pure function of the shared tile (K, L) shapes,
    so shards agree by construction; the reference's distributed path makes
    the same single-device-equals-distributed claim,
    ``tests/distributed/test_matching_distributed.py:183-195``).  Build the
    BlockCSC with ``bucketing="exact"``.

    ``local_range=(lo, hi)`` (multi-controller runs): the cheap shape pass
    still covers all shards (one program needs agreed shapes), but the
    EXPENSIVE per-shard Beneš routing runs only for shards [lo, hi) — each
    host routes its own devices' shards (reference analog: per-rank data
    ownership, ``run_matching_benchmark_dist.py:33-193``) — and the stacked
    leading axis is the local shard count, to be assembled globally with
    ``jax.make_array_from_process_local_data``.

    The returned layout carries ``plan_cache_paths`` (list, one per built
    shard; None entries when plan caching is off) — the sharded tile cache's
    breadcrumb (``dualip_tpu/io/tile_cache.py``).
    """
    from dualip_tpu.sparse.bcsc import _geom_thresholds, _pow2_thresholds

    m = bcsc.m
    shards = [_slice_bcsc_cols(bcsc, d, n_shards) for d in range(n_shards)]

    # pass 1: global thresholds + per-bucket shape maxima + forced N
    per_shard_counts = []
    for sh in shards:
        rows_valid = []
        for t in sh.tiles:
            rows = np.asarray(t.rows)
            lane = np.arange(rows.shape[1])[None, :]
            rows_valid.append(rows[lane < np.asarray(t.length)[:, None]])
        rows_valid = np.concatenate(rows_valid) if rows_valid else np.zeros(0, np.int64)
        per_shard_counts.append(np.bincount(rows_valid.astype(np.int64), minlength=m))
    max_count = max((int(c.max()) for c in per_shard_counts if c.size), default=1)
    thresholds = (
        _geom_thresholds(max(max_count, 1), 1.05)
        if compact
        else _pow2_thresholds(max(max_count, 1))
    )

    bucket_shapes = {}
    for c in per_shard_counts:
        nz = np.nonzero(c)[0]
        if nz.size == 0:
            continue
        bucket_of = np.searchsorted(thresholds, c[nz], side="left")
        for b in np.unique(bucket_of):
            sel = bucket_of == b
            R = int(sel.sum())
            Lr = int(c[nz][sel].max())
            R0, Lr0 = bucket_shapes.get(int(b), (0, 0))
            bucket_shapes[int(b)] = (max(R0, R), max(Lr0, Lr))

    col_total = 0  # Σ BP·L2·128 over panel regions (shared across shards)
    for t in shards[0].tiles:
        K, L = np.asarray(t.a).shape
        L2, _, BP = _col_geometry(K, L, compact)
        col_total += BP * L2 * 128
    row_total = sum(R * Lr for R, Lr in bucket_shapes.values())
    N = 1 << int(np.ceil(np.log2(max(col_total, row_total, 2))))
    forced = {"thresholds": thresholds, "bucket_shapes": bucket_shapes, "N": N}

    lo, hi = local_range if local_range is not None else (0, n_shards)
    layouts = [
        build_row_layout(
            shards[d],
            method="butterfly",
            plan_cache_dir=plan_cache_dir,
            _forced=forced,
            compact=compact,
        )
        for d in range(lo, hi)
    ]
    out = jax.tree.map(lambda *xs: jnp.stack(xs), *layouts)
    out.plan_cache_paths = [l.plan_cache_path for l in layouts]
    return out
