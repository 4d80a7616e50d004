"""Matching-LP dual objective — the hot path.

Parity: reference ``objectives/matching.py:37-307``.  Per dual-gradient
evaluation the reference ran, over flat CSC: ``z = -(A^T diag) λ/γ - c/γ`` in
two O(nnz) passes, a bucketed gather→project→scatter, a scatter-add row sum,
and three reductions (``matching.py:116-188``).  Here the problem is stored as
BlockCSC tiles, so one traced function does, per tile:

    gather λ[rows] → fused FMA (z) → batched projection → mask →
    a·x segment-sum into the m-vector → reg/obj reductions

with everything fused by XLA into a handful of O(nnz) passes; no host syncs.

Distribution (reference §2.2: NCCL reduce-to-rank-0 + barrier + broadcast):
tiles are sharded along the entity axis of a 1-D ``Mesh(("entities",))``; the
dual vector and ``b`` stay replicated.  The same traced function runs SPMD —
XLA partitions the segment-sum and inserts a single all-reduce of the
(m,)-gradient + two scalars per iteration, which is exactly the reference's
documented O(m) communication volume (``docs/solver/index.rst:128-130``)
without the rank-0 asymmetry, the barrier, or the two broadcasts.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import os

import jax
import jax.numpy as jnp
import numpy as np

from dualip_tpu.objectives.base import BaseInputArgs, BaseObjective
from dualip_tpu.projections.base import ProjectionEntry
from dualip_tpu.sparse.bcsc import (
    BlockCSC,
    build_blockcsc,
    device_put_blockcsc,
    tile_valid_mask,
    tiles_values_to_flat,
)
from dualip_tpu.sparse.csc import CSCMatrix
from dualip_tpu.types import ObjectiveResult

Array = jax.Array


@dataclass
class MatchingInputArgs(BaseInputArgs):
    """Input for the matching objective (reference ``matching.py:12-22``).

    ``A`` and ``c`` are same-pattern host CSC matrices (``m`` constraint rows ×
    ``n`` entity columns); ``b_vec`` is the (m,) constraint budget;
    ``b_vec=None`` marks a shard-local partition (reference ``matching.py:54-56``).
    """

    A: CSCMatrix
    c: CSCMatrix
    projection_map: Dict[str, ProjectionEntry]
    b_vec: Optional[np.ndarray]
    equality_mask: Optional[np.ndarray] = None


def _layout_extra(compact: bool, batching: bool, n_shards: int) -> str:
    """Cache-key discriminator for every layout-affecting option.

    batching changes bucket boundaries (and so the whole layout); compact
    revs at /g2 (BP padded to 8); the shard count changes every forced
    shape.  Must stay in lockstep with what the constructor builds."""
    extra = f"compact={compact}/batching={batching}"
    if compact:
        extra += "/g2"
    if n_shards > 1:
        extra += f"/shards={n_shards}"
    return extra


def matching_tile_cache_key(
    matching_input_args,
    n_shards: int = 1,
    pallas_block_k: int = 1024,
    dtype=np.float32,
    compact: bool = False,
    batching: bool = True,
    tile_cache_key=None,
) -> str:
    """The device-ready tile-cache key the objective constructor computes for
    the butterfly layout with these options — for EXTERNAL cache builders
    (``dualip_tpu/io/streaming_build.py``, the canonical prime) that must
    publish under the exact key a later solve will look up."""
    from dualip_tpu.io import tile_cache as _tc

    args = matching_input_args
    pad = max(1, n_shards) * max(pallas_block_k, 128)
    return _tc.compute_cache_key(
        args.A, args.c, args.projection_map, pad, dtype, tile_cache_key,
        extra=_layout_extra(compact, batching, max(1, n_shards)),
    )


def calc_grad(dual_grad: Array, dual_obj: Array, dual_val: Array, b_vec: Array, reg_penalty: Array):
    """Finalize: grad -= b; obj += reg + λ·grad (reference ``matching.py:25-34``)."""
    dual_grad = dual_grad - b_vec
    dual_obj = dual_obj + reg_penalty + jnp.dot(dual_val, dual_grad)
    return dual_grad, dual_obj


def transpose_tiles(bcsc: BlockCSC) -> BlockCSC:
    """Re-layout tiles to (L, K) for the Pallas fused path (lanes carry the
    large entity axis; see ``dualip_tpu/ops/pallas_matching.py``)."""
    from dualip_tpu.sparse.bcsc import Tile

    tiles_T = [
        Tile(
            rows=jnp.asarray(np.asarray(t.rows).T.copy()),
            a=jnp.asarray(np.asarray(t.a).T.copy()),
            c=jnp.asarray(np.asarray(t.c).T.copy()),
            length=jnp.asarray(np.asarray(t.length)),
            col_ids=jnp.asarray(np.asarray(t.col_ids)),
        )
        for t in bcsc.tiles
    ]
    return BlockCSC(tiles=tiles_T, specs=bcsc.specs, m=bcsc.m, n=bcsc.n, nnz=bcsc.nnz)


def device_put_blockcsc_T(bcsc_T: BlockCSC, mesh) -> BlockCSC:
    """Device-put (L, K)-transposed tiles sharded along K (axis 1 of the 2-D
    arrays, axis 0 of the per-column vectors) over a 1-D mesh."""
    from jax.sharding import NamedSharding, PartitionSpec

    from dualip_tpu.sparse.bcsc import Tile

    axis = mesh.axis_names[0]
    s2d = NamedSharding(mesh, PartitionSpec(None, axis))
    s1d = NamedSharding(mesh, PartitionSpec(axis))
    tiles = [
        Tile(
            rows=jax.device_put(t.rows, s2d),
            a=jax.device_put(t.a, s2d),
            c=jax.device_put(t.c, s2d),
            length=jax.device_put(t.length, s1d),
            col_ids=jax.device_put(t.col_ids, s1d),
        )
        for t in bcsc_T.tiles
    ]
    return BlockCSC(tiles=tiles, specs=bcsc_T.specs, m=bcsc_T.m, n=bcsc_T.n, nnz=bcsc_T.nnz)


def matching_local_parts_pallas(
    bcsc_T: BlockCSC, dual_val: Array, gamma, block_k: int, interpret: bool = False,
    want_primal: bool = False,
) -> Tuple[Array, Array, Array, List[Array]]:
    """Pallas-fused shard-local parts over (L, K)-transposed tiles."""
    from dualip_tpu.ops.pallas_matching import fused_tile_eval_T

    dtype = dual_val.dtype
    neg_inv_gamma = jnp.asarray(-1.0, dtype) / jnp.asarray(gamma, dtype)
    scaled = neg_inv_gamma * dual_val

    grad = jnp.zeros(bcsc_T.m, dtype=dtype)
    dual_obj = jnp.zeros((), dtype=dtype)
    reg_sum = jnp.zeros((), dtype=dtype)
    xs: List[Array] = []  # want_primal: per-tile (L, K) x
    for tile, spec in zip(bcsc_T.tiles, bcsc_T.specs):
        kind = spec.proj_type
        lam_g = scaled[tile.rows]  # XLA gather; Mosaic has no table gather
        ax, obj_p, reg_p, *x_p = fused_tile_eval_T(
            lam_g,
            tile.a,
            tile.c,
            tile.length,
            neg_inv_gamma,
            kind,
            spec.proj_params,
            block_k=min(block_k, tile.a.shape[1]),
            interpret=interpret,
            want_x=want_primal,
        )
        if want_primal:
            xs.append(x_p[0])
        grad = grad + jax.ops.segment_sum(
            ax.reshape(-1), tile.rows.reshape(-1).astype(jnp.int32), num_segments=bcsc_T.m
        )
        dual_obj = dual_obj + obj_p.astype(dtype)
        reg_sum = reg_sum + reg_p.astype(dtype)
    reg = (jnp.asarray(gamma, dtype) / 2) * reg_sum
    return grad, dual_obj, reg, xs


def matching_local_parts_rowmajor(
    bcsc: BlockCSC,
    rl,
    dual_val: Array,
    gamma,
    block_k: int = 1024,
    carry_dtype=None,
    want_primal: bool = False,
) -> Tuple[Array, Array, Array, List[Array]]:
    """Scatter/gather-free (grad, dual_obj, reg) via the row-major companion
    layout (``dualip_tpu/sparse/rowmajor.py`` — see its docstring for the
    TPU rationale).  Identical math to ``matching_local_parts``; the gradient
    accumulation order differs (per-row lane sums instead of segment_sum),
    within normal fp32 reassociation tolerance.

    The row↔column carries run through per-nnz index gathers (``rl.zidx`` /
    ``RowTile.axidx``) or, when the layout was built with
    ``method="butterfly"``, through one Beneš plan forward and reverse
    (``dualip_tpu/ops/butterfly.py`` — ~70× faster than the gathers on TPU).

    ``carry_dtype`` (butterfly only, e.g. ``jnp.bfloat16``): storage dtype of
    the carry buffer.  The network itself does NO arithmetic on the payload
    (every stage is a pure exchange), so a narrow carry is lossless for the
    permutation — the only precision cost is ONE rounding of srow (the
    scaled dual broadcast) before the forward carry and one of a·x after the
    projection, while the six carry passes halve their HBM traffic.  c never
    passes through the carry (the panel kernel adds it in fp32), so the
    narrow carry only perturbs the a·λ term.  The projection kernel upcasts
    each VMEM block to fp32 internally, and the gradient lane-reduction
    accumulates in the dual's dtype, so objective/gradient error stays at the
    ~2^-9 relative level of the two roundings.  ``None`` (default) keeps
    everything in the dual's dtype — bit-identical to the golden-traced path.
    """
    dtype = dual_val.dtype
    neg_inv_gamma = jnp.asarray(-1.0, dtype) / jnp.asarray(gamma, dtype)
    scaled = neg_inv_gamma * dual_val  # (m,)
    butterfly = rl.plan is not None
    if butterfly:
        from dualip_tpu.ops.butterfly import apply_butterfly, apply_butterfly_tpu

        def carry(vec, reverse, truncate=True):
            if rl.use_tpu_kernel:
                return apply_butterfly_tpu(rl.plan, vec, reverse=reverse, truncate=truncate)
            return apply_butterfly(rl.plan, vec, reverse=reverse, truncate=truncate)

        # srow carry: ship only the masked dual broadcast; the panel kernel
        # computes z = a·srow + (-1/γ)·c from the column-side a/c it streams
        # anyway, so row-space a/c copies are never stored or read
        # (−8 B/nnz HBM resident and per-iteration traffic).  Padding slots
        # must carry zeros: the bijection completion can route them into
        # column padding slots and back into the summed a·x row layout.
        if rl.srow_colidx is not None:
            # Gather-srow fast path: the forward carry's action on the row-id
            # broadcast was precomputed at setup (``RowLayout.srow_colidx``),
            # so the (m+1)-entry scaled table (sentinel slot = 0, matching
            # the zero-padding contract above) is gathered straight into
            # column space — bit-identical to routing srow, at one idx read
            # instead of 3 carry passes + the pre-side mask read per
            # iteration (docs/performance.md traffic table).
            table = jnp.concatenate([scaled, jnp.zeros(1, dtype)])
            if carry_dtype is not None:
                table = table.astype(carry_dtype)
            buf = table[rl.srow_colidx]
            z_cat = None
        else:
            srow_parts = []
            for rt, (R, Lr) in zip(rl.row_tiles, rl.row_shapes):
                lane = jax.lax.broadcasted_iota(jnp.int32, (R, Lr), 1)
                s = jnp.where(
                    lane < rt.length[:, None], scaled[rt.row_ids][:, None], jnp.zeros((), dtype)
                )
                srow_parts.append(s.reshape(-1))
            z_cat = jnp.concatenate(srow_parts)
    else:
        # z in row layout: the dual value is constant per sublane — no per-nnz gather.
        z_parts = [
            rt.a * scaled[rt.row_ids][:, None] + neg_inv_gamma * rt.c for rt in rl.row_tiles
        ]
        z_cat = jnp.concatenate([p.reshape(-1) for p in z_parts] + [jnp.zeros(1, dtype=dtype)])

    # carry 1: srow (butterfly) / z (gather) into column space; project; partials.
    dual_obj = jnp.zeros((), dtype=dtype)
    reg = jnp.zeros((), dtype=dtype)
    ax_parts = []
    xs: List[Array] = []  # want_primal: per-tile x (panel form in butterfly mode)
    if butterfly:
        # The carry delivers srow in panel layout (``sparse/rowmajor.py``),
        # and the fused Pallas kernel computes z = a·srow + (-1/γ)·c and
        # projects each tile's region of the carry buffer IN PLACE
        # (``input_output_aliases``): z + Proj + a·x + Σc·x/Σx² in one
        # VMEM-resident pass per block — no λ gather, no row-space a/c, no
        # slice/relayout copies, no a·x re-assembly; the bisection never
        # re-reads HBM (see ops/pallas_matching.py::fused_panel_project).
        from dualip_tpu.ops.pallas_matching import fused_panel_project

        if z_cat is not None:
            if carry_dtype is not None:
                z_cat = z_cat.astype(carry_dtype)  # fused into the srow-write by XLA
            buf = carry(z_cat, reverse=False, truncate=False)  # full (N,)
        packs = rl.col_pack if rl.col_pack is not None else (None,) * len(rl.col_tiles_T)
        for pt, spec, off, pk in zip(rl.col_tiles_T, bcsc.specs, rl.col_offsets, packs):
            buf, obj_p, reg_p, *x_p = fused_panel_project(
                buf,
                pt.a,
                pt.c,
                pt.length,
                off,
                spec.proj_type,
                spec.proj_params,
                interpret=not rl.use_tpu_kernel,
                want_x=want_primal,
                neg_inv_gamma=neg_inv_gamma,
                pack=pk,
            )
            if want_primal:
                xs.append(x_p[0])
            dual_obj = dual_obj + obj_p.astype(dtype)
            reg = reg + (jnp.asarray(gamma, dtype) / 2) * reg_p.astype(dtype)
    else:
        for i, (tile, spec) in enumerate(zip(bcsc.tiles, bcsc.specs)):
            z = z_cat[rl.zidx[i]]
            x = spec.projection()(z)
            x = jnp.where(tile_valid_mask(tile, spec.L), x, jnp.zeros((), dtype=dtype))
            ax_parts.append((tile.a * x).reshape(-1))
            reg = reg + (jnp.asarray(gamma, dtype) / 2) * jnp.sum(x * x)
            dual_obj = dual_obj + jnp.sum(tile.c * x)
            if want_primal:
                xs.append(x)

    # carry 2: a·x back into row tiles; dense lane reduction; (m,) gather.
    if butterfly:
        ax_row_cat = carry(buf, reverse=True)  # buf holds a·x in place
        sums = []
        off = 0
        for R, Lr in rl.row_shapes:
            blk = ax_row_cat[off : off + R * Lr].reshape(R, Lr)  # static slice
            off += R * Lr
            # accumulate in the dual's dtype (narrow-carry mode stores a·x in
            # carry_dtype; the row sum must not inherit that)
            sums.append(jnp.sum(blk, axis=1, dtype=dtype))
    else:
        ax_cat = jnp.concatenate(ax_parts + [jnp.zeros(1, dtype=dtype)])
        sums = [jnp.sum(ax_cat[rt.axidx], axis=1) for rt in rl.row_tiles]
    sums_cat = jnp.concatenate(sums + [jnp.zeros(1, dtype=dtype)])
    grad = sums_cat[rl.row_pos]
    return grad, dual_obj, reg, xs


def matching_local_parts(
    bcsc: BlockCSC, dual_val: Array, gamma, want_primal: bool = False
) -> Tuple[Array, Array, Array, List[Array]]:
    """Shard-local (grad, dual_obj, reg, [x tiles]) at ``dual_val``.

    Mirrors the reference pipeline ``matching.py:136-160`` with identical
    floating-point structure: ``scaled = (-1/γ)·λ``; ``z = a·scaled[row] +
    (-1/γ)·c``; project; ``grad = Σ a·x`` by row; ``reg = (γ/2)Σx²``;
    ``obj = Σ c·x``.
    """
    dtype = dual_val.dtype
    neg_inv_gamma = jnp.asarray(-1.0, dtype) / jnp.asarray(gamma, dtype)
    scaled = neg_inv_gamma * dual_val  # (m,)

    grad = jnp.zeros(bcsc.m, dtype=dtype)
    dual_obj = jnp.zeros((), dtype=dtype)
    reg = jnp.zeros((), dtype=dtype)
    xs: List[Array] = []

    for tile, spec in zip(bcsc.tiles, bcsc.specs):
        z = tile.a * scaled[tile.rows] + neg_inv_gamma * tile.c
        x = spec.projection()(z)
        # Valid-only scatter-back (reference sparse_utils.py:214): padded
        # lanes are zeroed so they contribute nothing downstream.
        x = jnp.where(tile_valid_mask(tile, spec.L), x, jnp.zeros((), dtype=dtype))
        grad = grad + jax.ops.segment_sum(
            (tile.a * x).reshape(-1), tile.rows.reshape(-1).astype(jnp.int32), num_segments=bcsc.m
        )
        reg = reg + (jnp.asarray(gamma, dtype) / 2) * jnp.sum(x * x)
        dual_obj = dual_obj + jnp.sum(tile.c * x)
        if want_primal:
            xs.append(x)
    return grad, dual_obj, reg, xs


def matching_exact_cert_csc(bcsc: BlockCSC, dual_val: Array, gamma) -> Tuple[Array, Array, Array]:
    """Shard-local pieces of the EXACT matching certificate (csc tiles).

    Returns ``(term, cxrow, ax)`` where ``term = Σ_i radius_i·max(0, max_k
    z_ik)`` (so the exact unregularized dual bound is ``g₀(λ) = −λᵀb −
    γ·term``), ``cxrow[r] = Σ_{ik∈row r} c_ik·x̂_ik`` and ``ax = A x̂`` for
    the γ-subproblem primal x̂.  Padding slots enter z as zeros, which the
    ``max(0, ·)`` clamp absorbs exactly (a simplex always admits x = 0).
    """
    dtype = dual_val.dtype
    neg_inv_gamma = jnp.asarray(-1.0, dtype) / jnp.asarray(gamma, dtype)
    scaled = neg_inv_gamma * dual_val
    m = bcsc.m
    term = jnp.zeros((), dtype=dtype)
    ax = jnp.zeros(m, dtype=dtype)
    cxrow = jnp.zeros(m, dtype=dtype)
    for tile, spec in zip(bcsc.tiles, bcsc.specs):
        z = tile.a * scaled[tile.rows] + neg_inv_gamma * tile.c
        radius = jnp.asarray(dict(spec.proj_params).get("z", 1.0), dtype)
        term = term + radius * jnp.sum(jnp.maximum(jnp.max(z, axis=1), 0.0))
        x = spec.projection()(z)
        x = jnp.where(tile_valid_mask(tile, spec.L), x, jnp.zeros((), dtype=dtype))
        rows_flat = tile.rows.reshape(-1).astype(jnp.int32)
        ax = ax + jax.ops.segment_sum((tile.a * x).reshape(-1), rows_flat, num_segments=m)
        cxrow = cxrow + jax.ops.segment_sum((tile.c * x).reshape(-1), rows_flat, num_segments=m)
    return term, cxrow, ax


def matching_exact_cert_rowmajor(
    bcsc: BlockCSC, rl, dual_val: Array, gamma
) -> Tuple[Array, Array, Array]:
    """Exact-certificate pieces through the butterfly layout (plain or
    compact packing) — same contract as ``matching_exact_cert_csc``.

    One forward srow carry + the panel z/projection pass (pure jnp — the
    certificate is a rare check, not the hot loop) + TWO reverse carries
    (a·x̂ for ``ax``, c·x̂ for ``cxrow``).  Certificates always run the
    carry in the dual's dtype regardless of the hot path's narrow
    ``carry_dtype``.
    """
    if rl.plan is None:
        raise ValueError("exact certificate on the row layout needs the butterfly plan")
    from dualip_tpu.ops.butterfly import apply_butterfly, apply_butterfly_tpu
    from dualip_tpu.ops.pallas_matching import _project_block

    dtype = dual_val.dtype
    neg_inv_gamma = jnp.asarray(-1.0, dtype) / jnp.asarray(gamma, dtype)
    scaled = neg_inv_gamma * dual_val

    def carry(vec, reverse, truncate=True):
        if rl.use_tpu_kernel:
            return apply_butterfly_tpu(rl.plan, vec, reverse=reverse, truncate=truncate)
        return apply_butterfly(rl.plan, vec, reverse=reverse, truncate=truncate)

    srow_parts = []
    for rt, (R, Lr) in zip(rl.row_tiles, rl.row_shapes):
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, Lr), 1)
        s = jnp.where(lane < rt.length[:, None], scaled[rt.row_ids][:, None], jnp.zeros((), dtype))
        srow_parts.append(s.reshape(-1))
    buf = carry(jnp.concatenate(srow_parts), reverse=False, truncate=False)

    term = jnp.zeros((), dtype=dtype)
    pieces_u, pieces_w = [], []  # (region_off, flat panel-layout values)
    packs = rl.col_pack if rl.col_pack is not None else (None,) * len(rl.col_tiles_T)
    for pt, spec, off, pk in zip(rl.col_tiles_T, bcsc.specs, rl.col_offsets, packs):
        kind, params = spec.proj_type, dict(spec.proj_params)
        radius = jnp.asarray(params.get("z", 1.0), dtype)
        a_p = pt.a.astype(dtype)
        c_p = pt.c.astype(dtype)
        if pk is None:
            KP, L, C = a_p.shape
            L2 = (1 << max(L - 1, 0).bit_length()) if L > 1 else 1
            region = buf[off : off + KP * L2 * C].reshape(KP, L2, C).astype(dtype)
            z = a_p * region[:, :L, :] + neg_inv_gamma * c_p
            term = term + radius * jnp.sum(jnp.maximum(jnp.max(z, axis=1), 0.0))
            x = _project_block(z, kind, params, pt.length, L, axis=1)
        else:
            L, L2, q = pk
            BP, QL, C = a_p.shape
            region = buf[off : off + BP * L2 * C].reshape(BP, L2, C).astype(dtype)
            z = a_p * region[:, :QL, :] + neg_inv_gamma * c_p
            z4 = z.reshape(BP, q, L, C)
            term = term + radius * jnp.sum(jnp.maximum(jnp.max(z4, axis=2), 0.0))
            x = _project_block(
                z4, kind, params, pt.length[:, :, None, :], L, axis=2
            ).reshape(BP, QL, C)

        def ghost_pad(v):
            if L2 > v.shape[1]:
                v = jnp.pad(v, ((0, 0), (0, L2 - v.shape[1]), (0, 0)))
            return v.reshape(-1)

        pieces_u.append((off, ghost_pad(a_p * x)))
        pieces_w.append((off, ghost_pad(c_p * x)))

    def back_to_rows(pieces):
        parts = [p for _, p in sorted(pieces, key=lambda t: t[0])]
        vec_row = carry(jnp.concatenate(parts), reverse=True)
        sums, offr = [], 0
        for R, Lr in rl.row_shapes:
            blk = vec_row[offr : offr + R * Lr].reshape(R, Lr)
            offr += R * Lr
            sums.append(jnp.sum(blk, axis=1, dtype=dtype))
        cat = jnp.concatenate(sums + [jnp.zeros(1, dtype=dtype)])
        return cat[rl.row_pos]

    return term, back_to_rows(pieces_w), back_to_rows(pieces_u)


def _panel_x_to_kl(x_np: np.ndarray, K: int, pk, n_shards: int = 1) -> np.ndarray:
    """Re-layout a want_x panel output to the (K, L) column-tile form.

    Plain panels arrive as (K//128, L, 128) — per-shard panels concatenate to
    exactly the global panel order, so the mesh case needs no special
    handling.  Compact panels arrive as (BP, q·L, 128) per shard with
    per-shard shortfall padding rows (``rowmajor._col_geometry``), so each
    shard's block is unstacked to its real (pr_d, L, 128) panels first."""
    if pk is None:
        return x_np.transpose(0, 2, 1).reshape(-1, x_np.shape[1])
    L, _L2, q = pk
    Kd = K // n_shards
    prd = Kd // 128
    BPd = x_np.shape[0] // n_shards
    parts = [
        x_np[s * BPd : (s + 1) * BPd].reshape(-1, L, 128)[:prd] for s in range(n_shards)
    ]
    return np.concatenate(parts).transpose(0, 2, 1).reshape(K, L)


def _finalize(grad, dual_obj, reg, dual_val, b_vec) -> ObjectiveResult:
    grad, dual_obj = calc_grad(grad, dual_obj, dual_val, b_vec, reg)
    dual_val_times_grad = jnp.dot(dual_val, grad)
    zero = jnp.zeros((), dtype=grad.dtype)
    max_pos_slack = jnp.maximum(jnp.max(grad), zero)
    sum_pos_slack = jnp.sum(jnp.maximum(grad, zero))
    return ObjectiveResult(
        dual_gradient=grad,
        dual_objective=dual_obj,
        reg_penalty=reg,
        dual_val_times_grad=dual_val_times_grad,
        max_pos_slack=max_pos_slack,
        sum_pos_slack=sum_pos_slack,
    )


class MatchingSolverDualObjectiveFunction(BaseObjective):
    """Single-mesh matching objective (reference ``matching.py:37-188``).

    With ``b_vec=None`` it computes only the shard-local parts (the
    reference's worker role, ``matching.py:56``); with ``b_vec`` set it
    returns the finalized gradient/objective/slacks.

    Pass ``mesh`` (a 1-D ``jax.sharding.Mesh``) to shard the tiles over the
    entity axis; the solve then runs SPMD with one all-reduce per iteration.

    ``layout`` selects the gradient formulation: ``"csc"`` (column tiles +
    segment_sum, the reference-shaped pipeline) or ``"row"`` (the dual-layout
    scatter/gather-free path, ``dualip_tpu/sparse/rowmajor.py`` — much faster
    on TPU, single mesh device only).
    """

    def __init__(
        self,
        matching_input_args: MatchingInputArgs,
        gamma: float,
        batching: bool = True,
        mesh=None,
        keep_flat_idx: bool = True,
        dtype=np.float32,
        use_pallas: bool = False,
        pallas_block_k: int = 1024,
        layout: str = "csc",
        plan_cache_dir=None,
        keep_col_tiles: bool = True,
        carry_dtype=None,
        tile_cache_dir=None,
        tile_cache_key=None,
        compact: bool = False,
        srow_gather: bool = False,
    ):
        args = matching_input_args
        self.gamma = gamma
        self.is_distributed = args.b_vec is None  # parity: matching.py:56
        self.equality_mask = (
            jnp.asarray(args.equality_mask) if args.equality_mask is not None else None
        )
        self.mesh = mesh
        self.use_pallas = use_pallas
        self.pallas_block_k = pallas_block_k
        if layout not in ("csc", "row", "butterfly"):
            raise ValueError(
                f"Unknown layout {layout!r} (expected 'csc', 'row' or 'butterfly')"
            )
        if layout == "row" and (mesh is not None or use_pallas):
            raise ValueError("layout='row' is single-device and exclusive with use_pallas")
        if layout == "butterfly" and use_pallas:
            raise ValueError(
                "layout='butterfly' runs its own fused kernel; use_pallas is the csc-layout flag"
            )
        if carry_dtype is not None:
            if layout != "butterfly":
                raise ValueError("carry_dtype is a butterfly-layout knob")
            carry_dtype = jax.dtypes.canonicalize_dtype(carry_dtype)
        self.carry_dtype = carry_dtype
        self.layout = layout
        if compact and layout != "butterfly":
            raise ValueError("compact packing is butterfly-only")
        self.compact = compact
        if srow_gather:
            if layout != "butterfly":
                raise ValueError("srow_gather is a butterfly-layout knob")
            if mesh is not None:
                raise ValueError(
                    "srow_gather is single-device only (the stacked sharded "
                    "layout carries per-shard plans; route srow there)"
                )
        self.srow_gather = srow_gather

        pad = 1
        sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            axis = mesh.axis_names[0]
            pad = int(np.prod(mesh.devices.shape))
            # Tiles shard along K (axis 0 of (K, L) arrays, axis 0 of (K,) arrays).
            sharding = NamedSharding(mesh, PartitionSpec(axis))
        if use_pallas:
            # fused-kernel grid needs the (per-shard) entity count to divide block_k
            pad = pad * pallas_block_k
        if layout == "butterfly":
            # butterfly mode runs the fused panel projection kernel, which
            # reads the carry buffer in 128-column panels — per-shard K must
            # be a multiple of 128 (see sparse/rowmajor.py::PanelTile)
            n_shards = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
            pad = max(pad, n_shards * max(pallas_block_k, 128))

        # Device-ready layout cache (butterfly, hot-path-only builds —
        # single-device or single-controller mesh): a hit skips the tile fill
        # + row argsort + panel transposes entirely and stages the persisted
        # arrays (dualip_tpu/io/tile_cache).
        _n_shards_cache = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
        _cache_hit = False
        _cache_save = None  # (dir, key) — persist after a fresh build
        if (
            tile_cache_dir is not None
            and layout == "butterfly"
            and not keep_col_tiles
            and not keep_flat_idx
            and jax.process_count() == 1  # multihost builds are per-process slices
        ):
            from dualip_tpu.io import tile_cache as _tc

            _key = _tc.compute_cache_key(
                args.A, args.c, args.projection_map, pad, dtype, tile_cache_key,
                extra=_layout_extra(compact, batching, _n_shards_cache),
            )
            self.tile_cache_key = _key  # exposed for prime/bench marker plumbing
            _loaded = _tc.load_butterfly_state(
                tile_cache_dir, _key, use_tpu_kernel=jax.default_backend() == "tpu"
            )
            if _loaded is not None:
                self.bcsc, self.row_layout = _loaded
                if mesh is not None:
                    # stacked leaves → shard the leading axis over the mesh
                    from jax.sharding import NamedSharding, PartitionSpec

                    axis = mesh.axis_names[0]
                    self.row_layout = jax.tree.map(
                        lambda x: jax.device_put(
                            x,
                            NamedSharding(mesh, PartitionSpec(axis, *([None] * (x.ndim - 1)))),
                        ),
                        self.row_layout,
                    )
                _cache_hit = True
            else:
                _cache_save = (tile_cache_dir, _key)

        if not _cache_hit:
            self.bcsc = build_blockcsc(
                args.A,
                args.c,
                args.projection_map,
                batching=batching,
                pad_cols_to=pad,
                keep_flat_idx=keep_flat_idx,
                dtype=dtype,
                # compact: one bucket per distinct degree — zero within-tile
                # slot padding, the column half of the halved-N carry buffer
                bucketing="exact" if compact else "pow2",
            )
            self.row_layout = None
        if _cache_hit:
            pass
        elif layout == "butterfly" and mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from dualip_tpu.sparse.rowmajor import build_row_layout_sharded

            axis = mesh.axis_names[0]
            n_shards = int(np.prod(mesh.devices.shape))
            if jax.process_count() > 1:
                # Multi-controller: each process routes ONLY its own devices'
                # shards (the expensive Beneš routing parallelizes across
                # hosts; the cheap shape pass stays global so every process
                # compiles the identical program), then contributes its slice
                # of the stacked layout.
                pi = jax.process_index()
                mine = [
                    i for i, d in enumerate(mesh.devices.flat) if d.process_index == pi
                ]
                lo, hi = min(mine), max(mine) + 1
                if mine != list(range(lo, hi)):
                    raise ValueError(
                        "butterfly multihost layout needs each process's devices "
                        "contiguous along the mesh axis"
                    )
                rl = build_row_layout_sharded(
                    self.bcsc, n_shards, plan_cache_dir=plan_cache_dir,
                    local_range=(lo, hi), compact=compact,
                )
                self.row_layout = jax.tree.map(
                    lambda x: jax.make_array_from_process_local_data(
                        NamedSharding(mesh, PartitionSpec(axis, *([None] * (x.ndim - 1)))),
                        np.asarray(x),
                        (n_shards,) + tuple(x.shape[1:]),
                    ),
                    rl,
                )
            else:
                rl = build_row_layout_sharded(  # host tiles
                    self.bcsc, n_shards, plan_cache_dir=plan_cache_dir, compact=compact
                )
                self._plan_cache_paths = rl.plan_cache_paths  # pre-device_put
                # every leaf carries a leading shard axis — shard it over the mesh
                self.row_layout = jax.tree.map(
                    lambda x: jax.device_put(
                        x, NamedSharding(mesh, PartitionSpec(axis, *([None] * (x.ndim - 1))))
                    ),
                    rl,
                )
        elif layout in ("row", "butterfly"):
            from dualip_tpu.sparse.rowmajor import build_row_layout

            method = "butterfly" if layout == "butterfly" else "gather"
            self.row_layout = build_row_layout(  # host tiles
                self.bcsc, method=method, plan_cache_dir=plan_cache_dir, compact=compact
            )
        if layout == "butterfly" and not keep_col_tiles:
            # The butterfly hot path never reads the (K, L) column tiles (the
            # layout carries transposed copies); dropping them saves their
            # 12 B/nnz of HBM. save_primal needs them — it raises if dropped.
            self.bcsc = BlockCSC(
                tiles=[], specs=self.bcsc.specs, m=self.bcsc.m, n=self.bcsc.n, nnz=self.bcsc.nnz
            )
        elif use_pallas:
            self.bcsc = transpose_tiles(self.bcsc)
            if mesh is not None:
                self.bcsc = device_put_blockcsc_T(self.bcsc, mesh)
            else:
                self.bcsc = device_put_blockcsc(self.bcsc, None)
        else:
            self.bcsc = device_put_blockcsc(self.bcsc, sharding)
        if _cache_save is not None:
            # Persist only when the leaves are host-side (CPU backend) or when
            # explicitly forced: on TPU the save would FETCH GBs device→host,
            # which on tunneled pools degrades every later launch of this
            # process (CLAUDE.md) — prime the cache from a CPU build instead
            # (benchmark/run_canonical_scale.py --prime-tile-cache).
            if mesh is not None:
                plan_file = getattr(self, "_plan_cache_paths", None)
                if plan_file is not None and any(p is None for p in plan_file):
                    plan_file = None
            else:
                plan_file = getattr(self.row_layout, "plan_cache_path", None)
            if plan_file is not None and (
                jax.default_backend() != "tpu"
                or os.environ.get("DUALIP_TILE_CACHE_WRITE") == "1"
            ):
                from dualip_tpu.io import tile_cache as _tc

                _tc.save_butterfly_state(
                    _cache_save[0], _cache_save[1], self.bcsc, self.row_layout,
                    plan_file, n_shards=_n_shards_cache,
                )
        if srow_gather:
            # One-time: route the row-id broadcast through the plan — the
            # forward carry's action on ANY srow is then a gather by the
            # routed ids (``RowLayout.srow_colidx``; bit-identical, the
            # network does no payload arithmetic).  Ids ride fp32 through
            # the same carry kernels the hot path uses, so this works for
            # fresh builds AND cache-hit staged plans without touching the
            # cache format.  Cost: one forward application at setup + an
            # N×4 B resident index array; saves 3 HBM passes + the pre-side
            # mask read every iteration (docs/performance.md).
            import dataclasses as _dc

            from dualip_tpu.ops.butterfly import apply_butterfly, apply_butterfly_tpu

            rl = self.row_layout
            m_rows = self.bcsc.m
            if m_rows >= (1 << 24):
                raise ValueError(
                    "srow_gather routes row ids exactly through an fp32 carry; "
                    f"m={m_rows} exceeds the 2^24 exact-integer range"
                )
            # BenesPlanPacked carries N; the unpacked BenesPlan's masks are (S, N)
            N = rl.plan.N if hasattr(rl.plan, "N") else rl.plan.masks.shape[1]
            sent = jnp.asarray(float(m_rows), jnp.float32)

            def _route_ids(row_tiles):
                parts = []
                for rt, (R, Lr) in zip(row_tiles, rl.row_shapes):
                    lane = jax.lax.broadcasted_iota(jnp.int32, (R, Lr), 1)
                    ids = jnp.where(
                        lane < rt.length[:, None],
                        rt.row_ids[:, None].astype(jnp.float32),
                        sent,
                    )
                    parts.append(ids.reshape(-1))
                vec = jnp.concatenate(parts)
                pad = N - vec.shape[0]
                if pad:
                    vec = jnp.concatenate([vec, jnp.full(pad, sent, jnp.float32)])
                if rl.use_tpu_kernel:
                    routed = apply_butterfly_tpu(rl.plan, vec, reverse=False, truncate=False)
                else:
                    routed = apply_butterfly(rl.plan, vec, reverse=False, truncate=False)
                return routed.astype(jnp.int32)

            self.row_layout = _dc.replace(
                rl, srow_colidx=jax.jit(_route_ids)(rl.row_tiles)
            )
        self._jit_cache = {}
        if args.b_vec is not None:
            b = jnp.asarray(np.asarray(args.b_vec, dtype=dtype))
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                b = jax.device_put(b, NamedSharding(mesh, PartitionSpec()))
            self.b_vec = b
        else:
            self.b_vec = None

    @property
    def params(self):
        return (self.bcsc, self.b_vec, self.row_layout)

    def calculate_traceable(self, params, dual_val: Array, gamma) -> ObjectiveResult:
        bcsc, b_vec, row_layout = params
        g = self.gamma if gamma is None else gamma
        if row_layout is not None:
            if self.mesh is not None:
                # SPMD butterfly: every leaf of the stacked layout is sharded
                # on its leading shard axis; each device squeezes its slice
                # and runs the identical single-device pipeline, then one
                # psum of (grad, obj, reg) — same O(m) per-iteration volume
                # as the csc mesh path (SURVEY.md §2.2).
                from jax.sharding import PartitionSpec as P

                axis = self.mesh.axis_names[0]
                block_k = self.pallas_block_k
                carry_dtype = self.carry_dtype
                rl_specs = jax.tree.map(
                    lambda x: P(axis, *([None] * (x.ndim - 1))), row_layout
                )

                def local_parts(rl_stacked, dv, gg):
                    rl_local = jax.tree.map(lambda x: x[0], rl_stacked)
                    lgrad, lobj, lreg, _ = matching_local_parts_rowmajor(
                        bcsc, rl_local, dv, gg, block_k=block_k, carry_dtype=carry_dtype
                    )
                    return (
                        jax.lax.psum(lgrad, axis),
                        jax.lax.psum(lobj, axis),
                        jax.lax.psum(lreg, axis),
                    )

                grad, dual_obj, reg = jax.shard_map(
                    local_parts,
                    mesh=self.mesh,
                    in_specs=(rl_specs, P(), P()),
                    out_specs=(P(), P(), P()),
                    check_vma=False,  # pallas outputs carry no vma annotation
                )(row_layout, dual_val, jnp.asarray(g, dual_val.dtype))
            else:
                grad, dual_obj, reg, _ = matching_local_parts_rowmajor(
                    bcsc,
                    row_layout,
                    dual_val,
                    g,
                    block_k=self.pallas_block_k,
                    carry_dtype=self.carry_dtype,
                )
            if b_vec is not None:
                return _finalize(grad, dual_obj, reg, dual_val, b_vec)
            return ObjectiveResult(dual_gradient=grad, dual_objective=dual_obj, reg_penalty=reg)
        if self.use_pallas:
            interpret = jax.default_backend() != "tpu"
            if self.mesh is not None:
                # SPMD fused path: pallas_call is not auto-partitionable, so
                # the per-shard evaluation runs under shard_map with the same
                # single psum of (grad, obj, reg) XLA would insert for the jnp
                # path (reference §2.2's reduce+barrier+broadcast collapsed
                # into one all-reduce).
                from jax.sharding import PartitionSpec as P

                from dualip_tpu.sparse.bcsc import Tile

                axis = self.mesh.axis_names[0]
                tile_specs = [
                    Tile(
                        rows=P(None, axis),
                        a=P(None, axis),
                        c=P(None, axis),
                        length=P(axis),
                        col_ids=P(axis),
                    )
                    for _ in bcsc.tiles
                ]
                specs, m, n, nnz = bcsc.specs, bcsc.m, bcsc.n, bcsc.nnz
                block_k = self.pallas_block_k

                def local_parts(tiles, dv, gg):
                    local = BlockCSC(tiles=list(tiles), specs=specs, m=m, n=n, nnz=nnz)
                    lgrad, lobj, lreg, _ = matching_local_parts_pallas(
                        local, dv, gg, block_k, interpret=interpret
                    )
                    return (
                        jax.lax.psum(lgrad, axis),
                        jax.lax.psum(lobj, axis),
                        jax.lax.psum(lreg, axis),
                    )

                grad, dual_obj, reg = jax.shard_map(
                    local_parts,
                    mesh=self.mesh,
                    in_specs=(tile_specs, P(), P()),
                    out_specs=(P(), P(), P()),
                    # pallas_call out_shapes carry no vma annotation; skip the
                    # varying-across-mesh check (outputs are psum-replicated).
                    check_vma=False,
                )(bcsc.tiles, dual_val, jnp.asarray(g, dual_val.dtype))
            else:
                grad, dual_obj, reg, _ = matching_local_parts_pallas(
                    bcsc, dual_val, g, self.pallas_block_k, interpret=interpret
                )
        else:
            grad, dual_obj, reg, _ = matching_local_parts(bcsc, dual_val, g)
        if b_vec is not None:
            return _finalize(grad, dual_obj, reg, dual_val, b_vec)
        return ObjectiveResult(dual_gradient=grad, dual_objective=dual_obj, reg_penalty=reg)

    def calculate(
        self,
        dual_val: Array,
        gamma: Optional[float] = None,
        save_primal: bool = False,
        rank: int = 0,
        **kwargs,
    ) -> ObjectiveResult:
        del rank, kwargs
        g = self.gamma if gamma is None else gamma
        if not isinstance(g, jax.Array):
            g = jnp.asarray(np.float32(g))  # host scalar, no device round-trip
        dual_val = jnp.asarray(dual_val)

        if not save_primal:
            fn = self._jit_cache.get("calc")
            if fn is None:
                fn = jax.jit(lambda p, dv, gg: self.calculate_traceable(p, dv, gg))
                self._jit_cache["calc"] = fn
            return fn(self.params, dual_val, g)

        # --- save_primal: supported on EVERY layout, single-device AND
        # mesh-sharded (the reference returned x from its one hot path,
        # matching.py:155-162, and raised in distributed mode,
        # matching.py:255-256; the fast layouts here emit x as an extra
        # kernel output on demand — per shard under shard_map — and scatter
        # it back to flat CSC order via the host flat-index map).
        if any(spec.flat_idx is None for spec in self.bcsc.specs):
            raise NotImplementedError(
                "save_primal needs the flat CSC index map; build the objective "
                "with keep_flat_idx=True"
            )
        run = self._jit_cache.get("calc_primal")
        if run is None:
            use_pallas = self.use_pallas
            block_k = self.pallas_block_k
            carry_dtype = self.carry_dtype
            interpret = jax.default_backend() != "tpu"
            mesh = self.mesh

            def _local(bcsc, row_layout, dv, gg):
                if row_layout is not None:
                    return matching_local_parts_rowmajor(
                        bcsc, row_layout, dv, gg, block_k=block_k,
                        carry_dtype=carry_dtype, want_primal=True,
                    )
                if use_pallas:
                    return matching_local_parts_pallas(
                        bcsc, dv, gg, block_k, interpret=interpret, want_primal=True
                    )
                return matching_local_parts(bcsc, dv, gg, want_primal=True)

            @jax.jit
            def run(params, dv, gg):
                bcsc, b_vec, row_layout = params
                if mesh is not None and (row_layout is not None or use_pallas):
                    # Mesh fast layouts: the same shard_map pipelines as the
                    # hot path, with per-shard x as extra outputs — plain
                    # panels concatenate along the shard axis straight into
                    # global panel order; (grad, obj, reg) psum as usual.
                    from jax.sharding import PartitionSpec as P

                    axis = mesh.axis_names[0]
                    if row_layout is not None:
                        rl_specs = jax.tree.map(
                            lambda x: P(axis, *([None] * (x.ndim - 1))), row_layout
                        )

                        def local_parts(rl_stacked, dvv, gg2):
                            rl_local = jax.tree.map(lambda x: x[0], rl_stacked)
                            lgrad, lobj, lreg, xs = _local(bcsc, rl_local, dvv, gg2)
                            return (
                                jax.lax.psum(lgrad, axis),
                                jax.lax.psum(lobj, axis),
                                jax.lax.psum(lreg, axis),
                                tuple(xs),
                            )

                        x_specs = tuple(P(axis) for _ in self.bcsc.specs)
                        grad, dual_obj, reg, xs = jax.shard_map(
                            local_parts,
                            mesh=mesh,
                            in_specs=(rl_specs, P(), P()),
                            out_specs=(P(), P(), P(), x_specs),
                            check_vma=False,
                        )(row_layout, dv, gg)
                    else:
                        from dualip_tpu.sparse.bcsc import Tile

                        tile_specs = [
                            Tile(rows=P(None, axis), a=P(None, axis), c=P(None, axis),
                                 length=P(axis), col_ids=P(axis))
                            for _ in bcsc.tiles
                        ]
                        specs, mm, nn, nnz = bcsc.specs, bcsc.m, bcsc.n, bcsc.nnz

                        def local_parts(tiles, dvv, gg2):
                            local = BlockCSC(tiles=list(tiles), specs=specs, m=mm, n=nn, nnz=nnz)
                            lgrad, lobj, lreg, xs = _local(local, None, dvv, gg2)
                            return (
                                jax.lax.psum(lgrad, axis),
                                jax.lax.psum(lobj, axis),
                                jax.lax.psum(lreg, axis),
                                tuple(xs),
                            )

                        x_specs = tuple(P(None, axis) for _ in bcsc.tiles)  # (L, K) tiles
                        grad, dual_obj, reg, xs = jax.shard_map(
                            local_parts,
                            mesh=mesh,
                            in_specs=(tile_specs, P(), P()),
                            out_specs=(P(), P(), P(), x_specs),
                            check_vma=False,
                        )(bcsc.tiles, dv, gg)
                    xs = list(xs)
                else:
                    grad, dual_obj, reg, xs = _local(bcsc, row_layout, dv, gg)
                primal_obj = dual_obj  # c·x before finalization (reference matching.py:160-161)
                if b_vec is not None:
                    res = _finalize(grad, dual_obj, reg, dv, b_vec)
                else:
                    res = ObjectiveResult(dual_gradient=grad, dual_objective=dual_obj, reg_penalty=reg)
                return res, primal_obj, xs

            self._jit_cache["calc_primal"] = run

        res, primal_obj, xs = run(self.params, dual_val, g)
        res.primal_objective = primal_obj
        # Re-layout each tile's x to the (K, L) column-tile form, then scatter
        # to a flat CSC-ordered nnz vector, like the reference's
        # intermediate.values() (reference matching.py:156-162).
        n_shards = int(np.prod(self.mesh.devices.shape)) if self.mesh is not None else 1
        packs = (
            self.row_layout.col_pack
            if (self.layout == "butterfly" and self.compact)
            else (None,) * len(self.bcsc.specs)
        )
        xs_kl = []
        for x, spec, pk in zip(xs, self.bcsc.specs, packs):
            x = np.asarray(x)
            if self.layout == "butterfly":
                x = _panel_x_to_kl(x, spec.K, pk, n_shards=n_shards)
            elif self.use_pallas:
                x = x.T  # (L, K) transposed-tile form
            xs_kl.append(x)
        res.primal_var = tiles_values_to_flat(self.bcsc, xs_kl)
        return res

    def exact_certificate(self, dual_val: Array, gamma: Optional[float] = None) -> dict:
        """TRUE certified optimality gap for the matching LP (VERDICT r4 #2).

        The reference defines a convergence certificate only for its
        general-LP objective (reference ``miplib.py:156-230``, box polytopes);
        its benchmarked matching workload (reference ``benchmark/
        config.py:9-19``) never gets one.  For per-entity simplex-inequality
        polytopes both sides are closed-form, so this computes, in O(nnz):

        * **exact dual lower bound** (weak duality, λ ≥ 0): a linear program
          over the simplex {x ≥ 0, Σx ≤ radius} attains its minimum at a
          vertex or at 0, so ``g₀(λ) = −λᵀb + Σ_i radius_i·min(0, min_k
          r_ik)`` with reduced costs ``r = c + Aᵀλ``; in the solver's scaled
          variables ``r = −γ·z``, giving ``g₀ = −λᵀb − γ·Σ_i radius_i·
          max(0, max_k z_ik)``.
        * **feasible primal upper bound**: the γ-subproblem primal x̂ is
          per-entity feasible by construction; each nonzero belongs to
          exactly one coupling row, so scaling every nonzero of a violated
          row r by ``s_r = b_r / (A x̂)_r ≤ 1`` yields ``A x̂' ≤ b`` exactly
          while keeping each column inside its simplex (requires A ≥ 0 and
          b > 0, both true of the matching workload by construction:
          reference ``generate_synthetic_data.py:95-141``).

        Certified gap = ``c·x̂' − g₀(λ) ≥ opt-gap`` of BOTH bounds.  Returns
        a dict of floats: ``primal_ub``, ``dual_lb``, ``gap_abs``,
        ``gap_rel`` (PDLP normalization |p−d|/(1+|p|+|d|)), and
        ``max_row_violation`` (pre-repair, diagnostic).
        """
        if self.b_vec is None:
            raise ValueError("exact_certificate needs the finalized objective (b_vec)")
        if self.mesh is not None:
            raise NotImplementedError("exact_certificate runs on a single mesh device")
        if self.equality_mask is not None:
            raise NotImplementedError(
                "exact_certificate covers inequality rows only (the scaling "
                "repair cannot restore equality rows)"
            )
        kinds = {spec.proj_type for spec in self.bcsc.specs}
        if kinds - {"simplex"}:
            raise NotImplementedError(
                f"exact_certificate supports simplex-inequality polytopes only "
                f"(got {sorted(kinds)}); box polytopes are covered by the "
                f"general-LP PDLP certificate (objectives/miplib.py)"
            )
        g = self.gamma if gamma is None else gamma
        if not isinstance(g, jax.Array):
            g = jnp.asarray(np.float32(g))
        fn = self._jit_cache.get("exact_cert")
        if fn is None:

            @jax.jit
            def fn(params, dv, gg):
                bcsc, b_vec, row_layout = params
                dv = jnp.maximum(dv, 0.0)  # weak duality needs λ ≥ 0
                if row_layout is not None and row_layout.plan is not None:
                    term, cxrow, ax = matching_exact_cert_rowmajor(bcsc, row_layout, dv, gg)
                else:  # csc layout, or gather-mode row layout (col tiles kept)
                    term, cxrow, ax = matching_exact_cert_csc(bcsc, dv, gg)
                s = jnp.where(ax > b_vec, b_vec / ax, jnp.ones((), dtype=ax.dtype))
                primal_ub = jnp.dot(s, cxrow)
                dual_lb = -jnp.dot(dv, b_vec) - gg * term
                return primal_ub, dual_lb, jnp.max(ax - b_vec)

            self._jit_cache["exact_cert"] = fn
        p, d, viol = jax.device_get(fn(self.params, jnp.asarray(dual_val), g))
        p, d = float(p), float(d)
        gap = p - d
        return {
            "primal_ub": p,
            "dual_lb": d,
            "gap_abs": gap,
            "gap_rel": gap / (1.0 + abs(p) + abs(d)),
            "max_row_violation": float(viol),
        }


class MatchingSolverDualObjectiveFunctionDistributed(MatchingSolverDualObjectiveFunction):
    """Mesh-sharded matching objective (reference ``matching.py:191-307``).

    The reference required the caller to pre-split data per rank and ran
    NCCL reduce + barrier + broadcast each iteration.  Here you hand the
    *global* problem plus a mesh; tiles are laid out sharded over the entity
    axis and the identical SPMD program runs on every device, with XLA
    inserting the single O(m) all-reduce.  ``rank``/``host_device`` arguments
    are accepted for API parity and ignored.
    """

    def __init__(
        self,
        local_matching_input_args: MatchingInputArgs,
        b_vec: np.ndarray,
        gamma: float,
        host_device=None,
        batching: bool = True,
        mesh=None,
        use_pallas: bool = False,
        pallas_block_k: int = 1024,
        layout: str = "csc",
        plan_cache_dir=None,
    ):
        del host_device
        if mesh is None:
            from dualip_tpu.parallel.mesh import default_mesh

            mesh = default_mesh()
        args = local_matching_input_args
        full_args = MatchingInputArgs(
            A=args.A,
            c=args.c,
            projection_map=args.projection_map,
            b_vec=np.asarray(b_vec),
            equality_mask=args.equality_mask,
        )
        super().__init__(
            full_args,
            gamma=gamma,
            batching=batching,
            mesh=mesh,
            use_pallas=use_pallas,
            pallas_block_k=pallas_block_k,
            layout=layout,
            plan_cache_dir=plan_cache_dir,
        )
