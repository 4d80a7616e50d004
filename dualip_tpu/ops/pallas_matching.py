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


def _project_block(z, kind: str, params: dict, length, L: int):
    """Project a (L, TK) block along axis 0; returns masked x."""
    dtype = z.dtype
    zero = jnp.zeros((), dtype=dtype)

    if kind in ("identity", "box", "cone"):
        # Clamps are elementwise (axis-independent), so the registered
        # operators apply unchanged to the (L, TK) layout — one source of
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
        v_max = jnp.max(vn, axis=0, keepdims=True)
        v_shift = vn - v_max

        def body(_, lohi):
            lo, hi = lohi
            mid = (lo + hi) * 0.5
            s = jnp.sum(jnp.maximum(v_shift - mid, zero), axis=0, keepdims=True)
            too_high = s > 1.0
            return jnp.where(too_high, mid, lo), jnp.where(too_high, hi, mid)

        lo0 = jnp.full(v_max.shape, -1.0, dtype)
        hi0 = jnp.zeros(v_max.shape, dtype)
        lo, hi = jax.lax.fori_loop(0, BISECTION_ITERS, body, (lo0, hi0))
        nu = (lo + hi) * 0.5
        w = jnp.maximum(v_shift - nu, zero) * radius

        if L > 1:
            # top-2 vertex shortcut (reference simplex.py:53-80)
            i0 = jnp.argmax(vn, axis=0)
            lane = jax.lax.broadcasted_iota(jnp.int32, vn.shape, 0)
            masked = jnp.where(lane == i0[None, :], jnp.asarray(-jnp.inf, dtype), vn)
            v1 = jnp.max(masked, axis=0, keepdims=True)
            shortcut = (v_max - v1) > 1.0
            onehot = jnp.where(lane == i0[None, :], radius, zero)
            w = jnp.where(shortcut, onehot, w)

        if kind == "simplex":  # inequality: feasible columns pass through
            feasible = jnp.sum(v, axis=0, keepdims=True) <= radius + tol
            w = jnp.where(feasible, v, w)
        x = w
    else:
        raise ValueError(f"Unsupported projection kind {kind!r}")

    lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    valid = lane < length  # length is (1, TK), broadcasts over sublanes
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


@functools.partial(
    jax.jit, static_argnames=("kind", "params_tuple", "block_k", "interpret")
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
) -> Tuple[Array, Array, Array]:
    """Evaluate one (L, K)-transposed tile: returns (a·x in (L,K), Σc·x, Σx²).

    ``lam_g_T`` is the XLA-side gather ``(-λ/γ)[rows_T]``; K must divide by
    ``block_k`` (the tile builder pads entity columns; padding columns carry
    ``length = 0`` and contribute zero).
    """
    L, K = a_T.shape
    params = dict(params_tuple)
    if K % block_k != 0:
        raise ValueError(f"K={K} not divisible by block_k={block_k}")
    grid = (K // block_k,)

    kernel = functools.partial(_fused_kernel, kind, params, L)
    ax, obj, reg = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars: (1,) neg_inv_gamma
            pl.BlockSpec((L, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((L, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, K), a_T.dtype),
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
    return ax, obj[0, 0], reg[0, 0]


def _fused_kernel_z(kind: str, params: dict, L: int, z_ref, a_ref, c_ref, len_ref, ax_ref, obj_ref, reg_ref):
    """Projection-only fusion: ``z`` arrives precomputed (butterfly-carried
    from the row layout, ``dualip_tpu/sparse/rowmajor.py``), so there is no
    λ gather and no z recompute — just Proj + a·x + partials in VMEM."""
    x = _project_block(z_ref[:], kind, params, len_ref[:], L)
    a = a_ref[:]
    c = c_ref[:]
    ax_ref[:] = a * x

    @pl.when(pl.program_id(0) == 0)
    def _():
        obj_ref[0, 0] = jnp.zeros((), jnp.float32)
        reg_ref[0, 0] = jnp.zeros((), jnp.float32)

    obj_ref[0, 0] += jnp.sum(c * x)
    reg_ref[0, 0] += jnp.sum(x * x)


@functools.partial(
    jax.jit, static_argnames=("kind", "params_tuple", "block_k", "interpret")
)
def fused_tile_eval_T_from_z(
    z_T: Array,
    a_T: Array,
    c_T: Array,
    length: Array,
    kind: str,
    params_tuple: Tuple = (),
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> Tuple[Array, Array, Array]:
    """Like ``fused_tile_eval_T`` but consumes a precomputed (L, K) ``z``
    block (the butterfly path computes z in row space and carries it to
    column space already transposed)."""
    L, K = a_T.shape
    params = dict(params_tuple)
    if K % block_k != 0:
        raise ValueError(f"K={K} not divisible by block_k={block_k}")
    grid = (K // block_k,)

    kernel = functools.partial(_fused_kernel_z, kind, params, L)
    ax, obj, reg = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((L, block_k), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, K), a_T.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(z_T, a_T, c_T, length.reshape(1, K))
    return ax, obj[0, 0], reg[0, 0]
