"""Pallas TPU kernels for the matching hot path.

The per-iteration pipeline per tile is

    z = a · (-λ/γ)[rows] + (-c/γ)  →  x = Proj(z)  →  mask  →  a·x, Σc·x, Σx²

In pure XLA the simplex projection is the weak link: the Duchi variant needs
an XLA sort, and a branch-free bisection (50 fixed halving steps) written in
jnp materializes the tile in HBM and re-reads it on every step.  This kernel
keeps the whole block resident in VMEM: one HBM read of (gathered-λ, a, c),
all 50 bisection steps on-chip, one HBM write of a·x, and the Σc·x / Σx²
partials accumulated in SMEM across the (sequential) grid.

The λ gather itself stays in XLA (Mosaic has no large-table gather); the
kernel consumes the pre-gathered ``lam_g = (-λ/γ)[rows]`` block.

Layout: tiles are TRANSPOSED to (L, K) here — lanes carry the large entity
axis K, sublanes the small block length L, so the VPU runs at full width for
every bucket size (the natural (K, L) layout would use L/128 of the lanes).

Projection semantics match the solver's Duchi path on its actual inputs: the
kernel pre-clamps to x ≥ 0 exactly like the reference's Duchi implementation
(reference ``simplex.py:148``), after which exact-bisection == Duchi (both
compute the Euclidean projection of the clamped vector; parity tested to
1e-5 in ``tests/ops/test_pallas_matching.py``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

DEFAULT_BLOCK_K = 1024
# The reference runs 50 bisection halvings (simplex.py:97-118); in fp32 the
# bracket [-1, 0] stops making representable progress after ~26 (2^-26 ≈
# 1.5e-8, below ulp at the solver's magnitudes and far below the 1e-6 tol).
# 30 keeps 4 halvings of slack and cuts the VMEM projection kernel's VPU work
# ~40% (profiled: the bisection loop dominates the kernel).
BISECTION_ITERS = 30


def _project_block(z, kind: str, params: dict, length, L: int, axis: int = 0):
    """Project a block along ``axis`` (reducing over the L lanes); returns
    masked x.  Layouts: (L, TK) with axis=0 (transposed-tile kernels) or
    (bp, L, 128) with axis=1 (panel kernels); ``length`` must be shaped to
    broadcast against ``z`` with the L axis kept (e.g. (1, TK) / (bp, 1, 128))."""
    dtype = z.dtype
    zero = jnp.zeros((), dtype=dtype)

    if kind in ("identity", "box", "cone"):
        # Clamps are elementwise (axis-independent), so the registered
        # operators apply unchanged to either layout — one source of
        # truth for defaults, 'l'/'u' aliases, and NaN-coded absent bounds.
        from dualip_tpu.projections.base import project

        x = project(kind, **params)(z)
    elif kind in ("simplex", "simplex_eq"):
        radius = jnp.asarray(params.get("z", 1.0), dtype)
        tol = jnp.asarray(1e-6, dtype)
        # Duchi-equivalent: pre-clamp (reference simplex.py:148), then exact
        # projection of the clamped vector via fixed-trip bisection.
        v = jnp.maximum(z, zero)
        vn = v / radius
        v_max = jnp.max(vn, axis=axis, keepdims=True)
        v_shift = vn - v_max

        def body(_, lohi):
            lo, hi = lohi
            mid = (lo + hi) * 0.5
            s = jnp.sum(jnp.maximum(v_shift - mid, zero), axis=axis, keepdims=True)
            too_high = s > 1.0
            return jnp.where(too_high, mid, lo), jnp.where(too_high, hi, mid)

        lo0 = jnp.full(v_max.shape, -1.0, dtype)
        hi0 = jnp.zeros(v_max.shape, dtype)
        lo, hi = jax.lax.fori_loop(0, BISECTION_ITERS, body, (lo0, hi0))
        nu = (lo + hi) * 0.5
        w = jnp.maximum(v_shift - nu, zero) * radius

        if L > 1:
            # top-2 vertex shortcut (reference simplex.py:53-80)
            i0 = jnp.argmax(vn, axis=axis, keepdims=True)
            lane = jax.lax.broadcasted_iota(jnp.int32, vn.shape, axis)
            masked = jnp.where(lane == i0, jnp.asarray(-jnp.inf, dtype), vn)
            v1 = jnp.max(masked, axis=axis, keepdims=True)
            shortcut = (v_max - v1) > 1.0
            onehot = jnp.where(lane == i0, radius, zero)
            w = jnp.where(shortcut, onehot, w)

        if kind == "simplex":  # inequality: feasible columns pass through
            feasible = jnp.sum(v, axis=axis, keepdims=True) <= radius + tol
            w = jnp.where(feasible, v, w)
        x = w
    elif kind in ("box_cut", "box_cut_eq"):
        # Box ∩ sum-cut (dualip_tpu/projections/box_cut.py): bisection on the
        # shift nu of x*(nu) = clip(z - nu, l, u); same VMEM-resident fixed-
        # trip shape as the simplex branch.  Padded lanes enter as zeros and
        # are re-masked after, like every other kind.
        from dualip_tpu.projections.box import _resolve

        p = dict(params)
        p.pop("method", None)
        lt = jnp.asarray(_resolve(p.get("l"), p.get("lower"), 0.0), dtype)
        ut = jnp.asarray(_resolve(p.get("u"), p.get("upper"), 1.0), dtype)
        zcut = jnp.asarray(p.get("z", 1.0), dtype)
        tol = jnp.asarray(1e-6, dtype)

        lo0 = jnp.min(z, axis=axis, keepdims=True) - ut
        hi0 = jnp.max(z, axis=axis, keepdims=True) - lt

        def body(_, lohi):
            lo, hi = lohi
            mid = (lo + hi) * 0.5
            s = jnp.sum(jnp.clip(z - mid, lt, ut), axis=axis, keepdims=True)
            too_high = s > zcut
            return jnp.where(too_high, mid, lo), jnp.where(too_high, hi, mid)

        lo, hi = jax.lax.fori_loop(0, BISECTION_ITERS, body, (lo0, hi0))
        nu = (lo + hi) * 0.5
        w = jnp.clip(z - nu, lt, ut)
        if kind == "box_cut":  # inequality: box-feasible columns pass through
            clipped = jnp.clip(z, lt, ut)
            feasible = jnp.sum(clipped, axis=axis, keepdims=True) <= zcut + tol
            w = jnp.where(feasible, clipped, w)
        x = w
    else:
        raise ValueError(f"Unsupported projection kind {kind!r}")

    lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, axis)
    valid = lane < length
    return jnp.where(valid, x, zero)


def _fused_kernel(kind: str, params: dict, L: int, scal_ref, lam_g_ref, a_ref, c_ref, len_ref, ax_ref, obj_ref, reg_ref):
    neg_inv_gamma = scal_ref[0]
    a = a_ref[:]
    c = c_ref[:]
    z = a * lam_g_ref[:] + neg_inv_gamma * c
    x = _project_block(z, kind, params, len_ref[:], L)

    ax_ref[:] = a * x

    @pl.when(pl.program_id(0) == 0)
    def _():
        obj_ref[0, 0] = jnp.zeros((), jnp.float32)
        reg_ref[0, 0] = jnp.zeros((), jnp.float32)

    obj_ref[0, 0] += jnp.sum(c * x)
    reg_ref[0, 0] += jnp.sum(x * x)


def _fused_kernel_x(kind: str, params: dict, L: int, scal_ref, lam_g_ref, a_ref, c_ref, len_ref, ax_ref, x_ref, obj_ref, reg_ref):
    """``_fused_kernel`` variant that also emits the projected primal x
    (the ``save_primal`` path on the use_pallas layout)."""
    neg_inv_gamma = scal_ref[0]
    a = a_ref[:]
    c = c_ref[:]
    z = a * lam_g_ref[:] + neg_inv_gamma * c
    x = _project_block(z, kind, params, len_ref[:], L)

    ax_ref[:] = a * x
    x_ref[:] = x

    @pl.when(pl.program_id(0) == 0)
    def _():
        obj_ref[0, 0] = jnp.zeros((), jnp.float32)
        reg_ref[0, 0] = jnp.zeros((), jnp.float32)

    obj_ref[0, 0] += jnp.sum(c * x)
    reg_ref[0, 0] += jnp.sum(x * x)


@functools.partial(
    jax.jit, static_argnames=("kind", "params_tuple", "block_k", "interpret", "want_x")
)
def fused_tile_eval_T(
    lam_g_T: Array,
    a_T: Array,
    c_T: Array,
    length: Array,
    neg_inv_gamma: Array,
    kind: str,
    params_tuple: Tuple = (),
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
    want_x: bool = False,
) -> Tuple[Array, ...]:
    """Evaluate one (L, K)-transposed tile: returns (a·x in (L,K), Σc·x, Σx²),
    plus the projected x in (L, K) when ``want_x=True`` (save_primal).

    ``lam_g_T`` is the XLA-side gather ``(-λ/γ)[rows_T]``; K must divide by
    ``block_k`` (the tile builder pads entity columns; padding columns carry
    ``length = 0`` and contribute zero).
    """
    L, K = a_T.shape
    params = dict(params_tuple)
    if K % block_k != 0:
        raise ValueError(f"K={K} not divisible by block_k={block_k}")
    grid = (K // block_k,)

    blk = lambda: pl.BlockSpec((L, block_k), lambda i: (0, i), memory_space=pltpu.VMEM)  # noqa: E731
    x_specs = [blk()] if want_x else []
    x_shapes = [jax.ShapeDtypeStruct((L, K), a_T.dtype)] if want_x else []
    kernel = functools.partial(_fused_kernel_x if want_x else _fused_kernel, kind, params, L)
    ax, *rest = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars: (1,) neg_inv_gamma
            blk(),
            blk(),
            blk(),
            pl.BlockSpec((1, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[blk()] + x_specs + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((L, K), a_T.dtype)] + x_shapes + [
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(neg_inv_gamma, jnp.float32).reshape(1),
        lam_g_T,
        a_T,
        c_T,
        length.reshape(1, K),
    )
    if want_x:
        x, obj, reg = rest
        return ax, obj[0, 0], reg[0, 0], x
    obj, reg = rest
    return ax, obj[0, 0], reg[0, 0]


def _panel_body(kind, params, L, q, scal_ref, s_ref, a_ref, c_ref, len_ref):
    """Shared panel-kernel body: z from the carried srow, project, a·x.

    ``s_ref`` holds the butterfly-carried ``srow = (-λ/γ)[row]`` region in
    panel layout (``sparse/rowmajor.py::PanelTile``); the kernel computes
    ``z = a·srow + (-1/γ)·c`` from the column-side a/c it streams anyway, so
    row-space copies of a/c never exist (the "srow carry").  Only the first
    q·L lanes are real; ghost lanes and narrow (bf16) carries upcast to fp32
    for the bisection — only the HBM storage of srow / a·x is narrow.

    ``q`` > 1 (compact packing, ``rowmajor._pack_geometry``): each buffer
    row carries q stacked length-L column segments; the block reshapes to
    (bp, q, L, 128) and projects along the L axis — ONE vectorized
    bisection for all segments, with ``len_ref`` (bp, q, 128) masking each
    segment's padding lanes.  Returns (x, a, c, ax) in compute dtype (ax
    narrowed to the carry dtype).
    """
    s = s_ref[...][:, : q * L, :]
    compute = jnp.float32 if (s.dtype == jnp.bfloat16 or a_ref.dtype == jnp.bfloat16) else s.dtype
    s = s.astype(compute)
    a = a_ref[...].astype(compute)
    c = c_ref[...].astype(compute)
    z = a * s + scal_ref[0].astype(compute) * c
    if q == 1:
        x = _project_block(z, kind, params, len_ref[...], L, axis=1)
    else:
        bp, _, C = z.shape
        z4 = z.reshape(bp, q, L, C)
        x = _project_block(z4, kind, params, len_ref[...][:, :, None, :], L, axis=2)
        x = x.reshape(bp, q * L, C)
    ax = (a * x).astype(s_ref.dtype)
    return x, a, c, ax


def _store_ax(o_ref, ax, L, L2):
    if L2 == L:
        o_ref[...] = ax
    else:
        o_ref[:, :L, :] = ax
        o_ref[:, L:, :] = jnp.zeros((ax.shape[0], L2 - L, ax.shape[2]), o_ref.dtype)


def _panel_kernel_x(kind: str, params: dict, L: int, L2: int, q: int, scal_ref, s_ref, a_ref, c_ref, len_ref, o_ref, x_ref, obj_ref, reg_ref):
    """``_panel_kernel`` variant that also emits the projected primal ``x``
    (panel form, (bp, L, 128)) — the one-shot ``save_primal`` path
    (reference ``matching.py:155-162`` returned x from its only pipeline;
    the fast layouts here recover it on demand without rebuilding)."""
    x, a, c, ax = _panel_body(kind, params, L, q, scal_ref, s_ref, a_ref, c_ref, len_ref)
    x_ref[...] = x.astype(x_ref.dtype)
    _store_ax(o_ref, ax, q * L, L2)

    @pl.when(pl.program_id(0) == 0)
    def _():
        obj_ref[0, 0] = jnp.zeros((), jnp.float32)
        reg_ref[0, 0] = jnp.zeros((), jnp.float32)

    obj_ref[0, 0] += jnp.sum(c * x)
    reg_ref[0, 0] += jnp.sum(x * x)


def _panel_kernel(kind: str, params: dict, L: int, L2: int, q: int, scal_ref, s_ref, a_ref, c_ref, len_ref, o_ref, obj_ref, reg_ref):
    """Project one (bp, L2, 128) block of the carry buffer IN PLACE.

    The carried srow arrives in panel layout; z is computed here (see
    ``_panel_body``), projected, and a·x written back over the region — the
    ghost (L2-q·L) lanes are rewritten as zeros, so the padded-projection
    semantics (pads participate as zeros, count = L, reference
    ``sparse_utils.py:207-214``) match the csc path exactly.
    """
    x, a, c, ax = _panel_body(kind, params, L, q, scal_ref, s_ref, a_ref, c_ref, len_ref)
    _store_ax(o_ref, ax, q * L, L2)

    @pl.when(pl.program_id(0) == 0)
    def _():
        obj_ref[0, 0] = jnp.zeros((), jnp.float32)
        reg_ref[0, 0] = jnp.zeros((), jnp.float32)

    obj_ref[0, 0] += jnp.sum(c * x)
    reg_ref[0, 0] += jnp.sum(x * x)


def fused_panel_project(
    buf: Array,
    a_p: Array,
    c_p: Array,
    len_p: Array,
    off: int,
    kind: str,
    params_tuple: Tuple = (),
    interpret: bool = False,
    want_x: bool = False,
    neg_inv_gamma: Array = None,
    pack: Tuple = None,
) -> Tuple[Array, ...]:
    """Compute z from the carried srow, project, and write a·x — one tile's
    region of the (N,) carry buffer, in place.

    ``buf`` holds the butterfly-carried ``srow = (-λ/γ)[row]`` (the srow
    carry; ``sparse/rowmajor.py::RowTile``); the kernel forms
    ``z = a·srow + neg_inv_gamma·c`` internally.  The tile region is rows
    ``[off/(128·L2), +K/128)`` of the free bitcast view
    ``buf.reshape(-1, L2, 128)`` (panel layout, offsets descending-L2 —
    ``sparse/rowmajor.py``).  On TPU the pallas_call ALIASES the buffer
    (``input_output_aliases``): it reads srow from its blocks and writes a·x
    back over them, leaving every other region untouched — no slice
    materialization, no relayout copy, no a·x re-assembly.  Returns
    ``(buf', Σc·x, Σx²)``, plus the projected x in panel form ``(KP, L, C)``
    fp32 when ``want_x=True`` (the ``save_primal`` path).

    In interpret mode (CPU tests) aliasing semantics for unvisited blocks
    are not guaranteed, so the region is sliced, projected non-aliased with
    the same kernel, and spliced back with a dynamic_update_slice.
    """
    import functools as _ft

    KP, QL, C = a_p.shape
    if pack is not None:  # compact: q stacked length-L segments per row
        L, L2, q = pack
        if QL != q * L:
            raise ValueError(f"packed tile shape {a_p.shape} vs pack {pack}")
    else:
        L, q = QL, 1
        # L2 (the region's lane stride): ghost lanes exist only in the buffer.
        L2 = 1 << max(L - 1, 0).bit_length() if L > 1 else 1
    bp = 8
    while KP % bp:
        bp //= 2
    # VMEM ceiling: the block set (carry in+out, a, c, fp32 z/x scratch,
    # double-buffered) scales with bp·L2; at the compact packing's L2=512
    # bp=8 overflows the ~16 MB scoped vmem (observed 17.75M) — halve bp
    # until bp·L2 ≤ 2048 (plain tiles, L2 ≤ 64-128, keep bp=8).
    while bp > 1 and bp * L2 > 2048:
        bp //= 2
    off0 = off // (128 * L2)
    assert off % (128 * L2) == 0 and off0 % bp == 0, (off, L2, bp)
    grid = (KP // bp,)
    kernel = _ft.partial(
        _panel_kernel_x if want_x else _panel_kernel, kind, dict(params_tuple), L, L2, q
    )
    obj_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    obj_shapes = [
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    ]
    tile_spec = lambda blk_l: pl.BlockSpec((bp, blk_l, C), lambda j: (j, 0, 0), memory_space=pltpu.VMEM)  # noqa: E731
    # want_x emits the projected x in the tile's OWN panel form — (KP, L, C)
    # plain, (KP, q·L, C) on the compact packing (the caller unstacks the q
    # segments host-side; see matching.py::_panel_x_to_kl).
    x_specs = [tile_spec(QL)] if want_x else []
    x_shapes = [jax.ShapeDtypeStruct((KP, QL, C), jnp.float32)] if want_x else []
    scal = jnp.asarray(neg_inv_gamma, jnp.float32).reshape(1)
    scal_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    if interpret:
        region = jax.lax.dynamic_slice(buf, (off,), (KP * L2 * C,)).reshape(KP, L2, C)
        out, *rest = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[scal_spec, tile_spec(L2), tile_spec(QL), tile_spec(QL), tile_spec(q)],
            out_specs=[tile_spec(L2)] + x_specs + obj_specs,
            out_shape=[jax.ShapeDtypeStruct((KP, L2, C), buf.dtype)] + x_shapes + obj_shapes,
            interpret=True,
        )(scal, region, a_p, c_p, len_p)
        buf = jax.lax.dynamic_update_slice(buf, out.reshape(-1), (off,))
    else:
        view = buf.reshape(-1, L2, C)
        base = off0 // bp
        view_spec = pl.BlockSpec((bp, L2, C), lambda j: (base + j, 0, 0), memory_space=pltpu.VMEM)
        # The compact 4D projection (bp, q, L, 128) pads L<8 segments to
        # whole sublane tiles inside the kernel, inflating its VMEM stack
        # past the default 16M scoped limit at canonical scale — lift the
        # per-kernel ceiling (physical VMEM is far larger; the block specs
        # above keep the streamed working set itself modest).
        params = (
            pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
            if q > 1
            else None
        )
        out, *rest = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[scal_spec, view_spec, tile_spec(QL), tile_spec(QL), tile_spec(q)],
            out_specs=[view_spec] + x_specs + obj_specs,
            out_shape=[jax.ShapeDtypeStruct(view.shape, buf.dtype)] + x_shapes + obj_shapes,
            input_output_aliases={1: 0},
            compiler_params=params,
            interpret=False,
        )(scal, view, a_p, c_p, len_p)
        buf = out.reshape(-1)
    if want_x:
        x, obj, reg = rest
        return buf, obj[0, 0], reg[0, 0], x
    obj, reg = rest
    return buf, obj[0, 0], reg[0, 0]
