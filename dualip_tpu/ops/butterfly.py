"""Beneš butterfly engine: static permutations at VMEM speed on TPU.

TPU has no gather/scatter hardware; XLA lowers ``x[perm]`` over millions of
elements to a near-serial loop (measured ~5-25 ns/element).  A *static*
permutation, however, is a Beneš network: ``2·log2(N)-1`` stages of paired
exchanges at distances ``2^{n-1}, …, 2, 1, 2, …, 2^{n-1}``, each stage a
*regular* roll + select — exactly what the VPU streams.  Measured on
hardware: 0.069 ms for 512K elements in a single-VMEM Pallas kernel vs
4.6 ms for the XLA gather of the same permutation (67×).

Pieces:

* ``benes_route(perm)`` — host-side routing: computes the per-stage swap
  masks by the classic looping argument (recursive 2-coloring of the
  alternating constraint cycles), fully vectorized in numpy via
  pointer-doubling (O(N log² N), no Python-level cycle walking).
* ``apply_butterfly(plan, x, reverse=False)`` — pure-jnp application (any
  backend; used for tests and as the CPU path).
* ``apply_butterfly_tpu(plan, x, reverse=False)`` — blocked TPU form:
  stages with distance < block run inside one Pallas kernel per block
  (whole chain in VMEM, masks DMA'd per stage); the few cross-block stages
  run as jnp roll+select full passes (stream speed).
* **Inverse for free**: the stage-distance sequence is a palindrome and
  every stage is an involution, so applying the SAME masks in reverse stage
  order applies ``perm⁻¹`` (``reverse=True``).  The matching hot loop needs
  exactly a permutation and its inverse per iteration (row→col for z,
  col→row for a·x), so one routing serves both.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclass
class BenesPlan:
    """Routing of one static permutation (host-built, device-applied).

    A pytree whose only leaf is ``masks``; the stage distances and valid
    lengths are static aux data (they steer trace-time Python control flow).
    """

    dists: tuple  # (2n-1,) static stage distances: 2^{n-1}..2..1..2..2^{n-1}
    masks: Array  # (2n-1, N) int8 — 1 where the pair at that stage swaps
    n_in: int  # valid input length (inputs zero-padded to N)
    n_out: int  # valid output length

    def tree_flatten(self):
        return (self.masks,), (self.dists, self.n_in, self.n_out)

    @classmethod
    def tree_unflatten(cls, aux, children):
        dists, n_in, n_out = aux
        return cls(dists=dists, masks=children[0], n_in=n_in, n_out=n_out)


jax.tree_util.register_pytree_node(
    BenesPlan, BenesPlan.tree_flatten, lambda aux, ch: BenesPlan.tree_unflatten(aux, ch)
)


def _components_min(h: np.ndarray, max_cycle_log2: int | None = None) -> np.ndarray:
    """Min element id over each orbit of permutation ``h`` (pointer doubling).

    ``max_cycle_log2`` bounds the orbit length (2^k): pointer doubling covers
    an orbit of length <= 2^k in k+1 steps, so callers that know their cycles
    are block-confined can skip most of the log2(N)+1 default passes.
    """
    rep = np.arange(h.size, dtype=np.int32)
    hk = h
    if max_cycle_log2 is None:
        max_cycle_log2 = int(np.ceil(np.log2(max(h.size, 2))))
    steps = max(1, max_cycle_log2 + 1)
    for _ in range(steps):
        rep = np.minimum(rep, rep[hk])
        hk = hk[hk]
    return rep


def _route_shape(perm: np.ndarray, pad_to, n_in):
    """Normalize (perm, n_out, n_in, N, n) for the routers.  Integer dtypes
    pass through (the 500M-nnz build hands int32; forcing int64 here cost a
    4 GB transient copy); anything else normalizes to int64."""
    perm = np.asarray(perm)
    if perm.dtype not in (np.int32, np.int64):
        perm = perm.astype(np.int64)
    n_out = perm.size
    if n_in is None:
        n_in = int(perm.max()) + 1 if perm.size else 1
    N = 1 << int(np.ceil(np.log2(max(n_out, n_in, 2))))
    if pad_to is not None:
        if pad_to < N:
            raise ValueError(f"pad_to={pad_to} < required {N}")
        N = pad_to
        if N & (N - 1):
            raise ValueError("pad_to must be a power of two")
    return perm, n_out, n_in, N, N.bit_length() - 1


def _complete_bijection(perm: np.ndarray, n_out: int, N: int) -> np.ndarray:
    """Complete an injective perm to a bijection on N slots (spares carry
    zeros either way).  Identity-preferring: a padding output slot whose
    same-numbered input is also unused maps to itself, making it a FIXED
    POINT of every routing stage — the cycle-walking router short-circuits
    fixed points, so the pow2 tail [n_out, N) (up to ~2x the real payload)
    routes in O(1)/slot instead of joining the miss-bound orbit chases."""
    src = np.full(N, -1, dtype=np.int32)
    src[:n_out] = perm
    used = np.zeros(N, dtype=bool)
    used[perm] = True
    tail = np.arange(n_out, N)
    fix = ~used[tail]  # same-numbered input free -> identity
    src[tail[fix]] = tail[fix]
    used[tail[fix]] = True
    src[tail[~fix]] = np.nonzero(~used)[0]
    return src


def _benes_dists(n: int) -> tuple:
    return tuple(1 << b for b in range(n - 1, 0, -1)) + (1,) + tuple(
        1 << b for b in range(1, n)
    )


def benes_route_planes(
    perm: np.ndarray, pad_to: int | None = None, n_in: int | None = None
):
    """Route ``perm`` and return ``(planes, dists, n_in, n_out)`` with the
    stage masks already bit-packed 8 stages/byte — the plan-cache / TPU
    currency — WITHOUT materializing the (2n-1, N) int8 masks when the
    native packed router is available (30.6 GB of transient RSS at the
    canonical N=2^29; the planes are 8x smaller).  Bit-for-bit equal to
    ``_packbits_stages(benes_route(...).masks)``."""
    perm, n_out, n_in, N, n = _route_shape(perm, pad_to, n_in)
    if N >= (1 << 14):
        from dualip_tpu.io.native_loader import benes_route_packed_native

        src = _complete_bijection(perm, n_out, N)
        planes = benes_route_packed_native(src)
        if planes is not None:
            return planes, _benes_dists(n), n_in, n_out
    plan = benes_route(perm, pad_to=pad_to, n_in=n_in)
    return _packbits_stages(np.asarray(plan.masks)), plan.dists, plan.n_in, plan.n_out


def benes_route(
    perm: np.ndarray, pad_to: int | None = None, n_in: int | None = None
) -> BenesPlan:
    """Route ``y = x_padded[perm]`` through a Beneš network.

    ``perm`` maps output position → input position and must be injective;
    inputs/outputs are zero-padded to the next power of two (spare slots are
    routed as an arbitrary bijection completion, carrying zeros).  ``n_in``
    pins the valid input length (default: ``perm.max() + 1``) — it sets the
    truncation of ``reverse=True`` outputs.
    """
    perm, n_out, n_in, N, n = _route_shape(perm, pad_to, n_in)
    src = _complete_bijection(perm, n_out, N)

    n_stages = 2 * n - 1

    # Native router: same masks bit-for-bit (parallel direct cycle walking,
    # native/dualip_native.cc::dualip_benes_route); numpy pointer-doubling
    # below is the fallback and the small-N path.
    if N >= (1 << 14):
        from dualip_tpu.io.native_loader import benes_route_native

        native_masks = benes_route_native(src)
        if native_masks is not None:
            dists = tuple(1 << b for b in range(n - 1, 0, -1)) + (1,) + tuple(
                1 << b for b in range(1, n)
            )
            # masks stay host-side: staging the unpacked (2n-1, N) array to
            # device here costs GBs of H2D (+D2H again in pack_plan); the
            # packed planes are shipped instead, and the unpacked CPU path
            # stages lazily on first use.
            return BenesPlan(dists=dists, masks=native_masks, n_in=n_in, n_out=n_out)

    masks = np.zeros((n_stages, N), dtype=np.int8)
    idx = np.arange(N, dtype=np.int32)

    for t, b in enumerate(range(n - 1, 0, -1)):
        D = np.int32(1) << b
        inv = np.empty(N, dtype=np.int32)
        inv[src] = idx
        f = idx ^ D  # exit-switch partner (element ids == dest slots)
        g = inv[src ^ D]  # entry-switch partner
        h = g[f]  # jump-2 along the alternating constraint cycle
        # Bits above b are pinned by earlier stages, so h only permutes within
        # independent blocks of 2^(b+1) slots — cycles can't be longer.
        rep = _components_min(h, max_cycle_log2=b + 1)
        # f maps each h-orbit to its parity complement; smaller-rep side = 0
        color = (rep > rep[f]).astype(np.int32)
        # entry stage swaps at source positions, exit stage at dest positions
        j = src
        m_entry = np.zeros(N, dtype=np.int8)
        m_entry[j] = (((j >> b) & 1) != color).astype(np.int8)
        m_exit = (((idx >> b) & 1) != color).astype(np.int8)
        masks[t] = m_entry
        masks[n_stages - 1 - t] = m_exit
        # pin bit b: element for dest i now enters sub-network `color`
        i2 = (idx & ~D) | (color << b)
        j2 = (j & ~D) | (color << b)
        new_src = np.empty(N, dtype=np.int32)
        new_src[i2] = j2
        src = new_src

    # middle stage (distance 1): whatever disagreement remains is a pair swap
    masks[n - 1] = (src != idx).astype(np.int8)

    dists = tuple(1 << b for b in range(n - 1, 0, -1)) + (1,) + tuple(
        1 << b for b in range(1, n)
    )
    return BenesPlan(dists=dists, masks=masks, n_in=n_in, n_out=n_out)  # host-side (see above)


def _stage_jnp(x: Array, mask: Array, d: int) -> Array:
    """One butterfly stage on a flat (N,) vector (pure jnp)."""
    N = x.shape[0]
    bit = (jax.lax.broadcasted_iota(jnp.int32, (N,), 0) & d) != 0
    fwd = jnp.roll(x, -d)
    bwd = jnp.roll(x, d)
    partner = jnp.where(bit, bwd, fwd)
    return jnp.where(mask != 0, partner, x)


def apply_butterfly(
    plan: BenesPlan, x: Array, reverse: bool = False, truncate: bool = True
) -> Array:
    """Apply the permutation (or its inverse) with pure jnp stages.

    ``truncate=False`` returns the full padded (N,) vector (spare slots carry
    zeros) — callers that immediately feed the result back through the
    network (the in-place projection chain) keep the full buffer."""
    N = plan.masks.shape[1]
    pad = N - x.shape[0]
    v = jnp.concatenate([x, jnp.zeros(pad, x.dtype)]) if pad else x
    order = range(len(plan.dists))
    if reverse:
        order = reversed(order)
    for s in order:
        v = _stage_jnp(v, plan.masks[s], plan.dists[s])
    if not truncate:
        return v
    return v[: (plan.n_in if reverse else plan.n_out)]


# ---------------------------------------------------------------------------
# Blocked TPU form: Pallas kernel for the in-VMEM (fine) stages
# ---------------------------------------------------------------------------

DEFAULT_BLOCK_LOG2 = 17  # 128K f32 = 512 KB block in VMEM


# Cap on the exchange-axis extent of one fused coarse pass: the kernel holds
# an (E, wr, 128) block (+ masks, double-buffered) in VMEM, so E must stay
# bounded as N grows.  Sides whose block count nb exceeds the cap run as ONE
# fused TWO-LEVEL pass (``_coarse2_kernel``): the (E_hi, E_lo, 128) strip
# holds every block position of one 128-lane slice in VMEM (nb·128·w bytes —
# ~2 MB fp32 at nb=4096), so ALL of the side's stages execute in a single
# r+w HBM pass; high-distance stages roll the E_hi axis, low-distance the
# E_lo axis.  Beyond FUSE_NB_CAP block positions the strip no longer fits
# VMEM and the side falls back to the legacy two-group split (high group,
# then low), covering nb ≤ E_CAP² (N ≤ 2^33 at the default block size).
COARSE_E_CAP = 256
# nb·128·4 B = 4 MB at 2^13 — the largest all-coarse strip worth keeping
# resident next to its (double-buffered) masks in ~16 MB VMEM.
COARSE_FUSE_NB_CAP = 8192


@dataclass
class BenesPlanPacked:
    """TPU-ready split of a ``BenesPlan`` at a fixed block size.

    Built ONCE (``pack_plan``); holds the fine-stage masks already permuted,
    reshaped to the (·, nb, R, C) form the Pallas kernel streams, and
    **bit-packed 8 stages per byte** (stage s lives in bit ``s & 7`` of plane
    ``s >> 3``): unpacked, mask traffic is S bytes per element per apply —
    8-9x the payload itself.  The per-iteration apply does no index shuffling
    on the 100MB-scale mask array (leaving that inside the compiled loop
    costs a full materialized copy per application).  The palindrome property
    means ONE buffer serves forward and reverse: reverse iterates the same
    stages backwards.

    Coarse stages are stored as GROUPS: ``pre_groups``/``post_groups`` are
    static ``(steps, E, I_rows)`` tuples (``steps`` = ((bit, q), ...) in
    forward execution order, ``q`` the roll distance in E-axis units) with
    per-group bit-planes in ``pre_masks``/``post_masks``.  One group per side
    when ``nb ≤ COARSE_E_CAP``; two (high-distance then low) otherwise.
    """

    fine_dists: tuple  # static, forward order
    pre_groups: tuple  # static ((steps, E, I_rows), ...) forward order
    post_groups: tuple
    fine_masks: Array  # (ceil(S_f/8), nb, R, C) uint8 bit-planes
    pre_masks: tuple  # per-group (ceil(S_g/8), O, E, I_rows, 128) uint8 bit-planes
    post_masks: tuple
    N: int
    n_in: int
    n_out: int
    block_log2: int

    def tree_flatten(self):
        return (self.fine_masks, self.pre_masks, self.post_masks), (
            self.fine_dists,
            self.pre_groups,
            self.post_groups,
            self.N,
            self.n_in,
            self.n_out,
            self.block_log2,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        fine_dists, pre_groups, post_groups, N, n_in, n_out, block_log2 = aux
        fine_masks, pre_masks, post_masks = children
        return cls(
            fine_dists=fine_dists,
            pre_groups=pre_groups,
            post_groups=post_groups,
            fine_masks=fine_masks,
            pre_masks=tuple(pre_masks),
            post_masks=tuple(post_masks),
            N=N,
            n_in=n_in,
            n_out=n_out,
            block_log2=block_log2,
        )


jax.tree_util.register_pytree_node(
    BenesPlanPacked,
    BenesPlanPacked.tree_flatten,
    lambda aux, ch: BenesPlanPacked.tree_unflatten(aux, ch),
)


def _packbits_stages(m: np.ndarray) -> np.ndarray:
    """(S, X) masks → (ceil(S/8), X) uint8 bit-planes, stage s → bit s&7 of plane s>>3."""
    if m.shape[0] == 0:
        return np.zeros((0, m.shape[1]), dtype=np.uint8)
    if m.dtype in (np.int8, np.uint8):
        # 0/1-valued by construction: pack the bytes directly (skips a
        # full-size boolean temporary — 30 GB at the canonical N=2^29)
        return np.packbits(m.view(np.uint8), axis=0, bitorder="little")
    return np.packbits(m != 0, axis=0, bitorder="little")


def _extract_planes(planes: np.ndarray, s0: int, s1: int) -> np.ndarray:
    """Re-base packed stage bit-planes to the stage subrange [s0, s1).

    ``planes`` packs stage s at bit s&7 of plane s>>3 (little bit-order);
    the result packs stage s0+j at bit j&7 of plane j>>3.  A pure byte-
    shift splice — stage masks are never unpacked, so regrouping the
    (ceil(S/8), N) cache planes into kernel groups costs O(planes) instead
    of materializing the (S, N) int8 form (30 GB at the canonical N=2^29)."""
    N = planes.shape[1]
    if s1 <= s0:
        return np.zeros((0, N), dtype=np.uint8)
    P = (s1 - s0 + 7) // 8
    out = np.empty((P, N), dtype=np.uint8)
    for q in range(P):
        s = s0 + 8 * q
        k, r = s >> 3, s & 7
        v = planes[k] >> r if r else planes[k].copy()
        if r and k + 1 < planes.shape[0]:
            v |= (planes[k + 1] << (8 - r)).astype(np.uint8)
        nbits = min(8, s1 - s)
        if nbits < 8:
            v &= (1 << nbits) - 1
        out[q] = v
    return out


def _shaped_group_mask(planes: np.ndarray, s0: int, s1: int, E: int, I_rows: int):
    """Extract a group's planes re-based to [s0, s1) AND pre-shaped to the
    (P, O, E, I_rows, 128) view the coarse kernel streams.  Shaping at pack
    time matters: a (P, N) mask reshaped inside the compiled iteration loop
    materializes a full copy per application (512 MB × 3 per iteration at
    the canonical N=2^29 — the reshape crosses the tiled layout)."""
    g = _extract_planes(planes, s0, s1)
    P, N = g.shape
    O = N // (E * I_rows * 128)
    return jnp.asarray(g.reshape(P, O, E, I_rows, 128))


def _pack_side(s0, s1, qs, planes, nb, R, e_cap):
    """Pack one side's coarse stages [s0, s1) into 1-2 contiguous groups.

    ``qs`` are the block distances (powers of two < nb) in forward execution
    order.  Three regimes by block count:

    * ``nb ≤ e_cap``: one single-level group — exchange along the full block
      axis E = nb of the (O, E, I_rows, 128) view.
    * ``e_cap < nb ≤ COARSE_FUSE_NB_CAP``: one fused TWO-LEVEL group — the
      (E_hi, E_lo, 128) strip holds every block position of one 128-lane
      slice (nb·128·w bytes of VMEM), descriptor ``(steps, (E_hi, E_lo), R)``;
      stages with q ≥ E_lo roll the E_hi axis by q/E_lo, the rest roll E_lo.
      ALL of the side's stages run in one r+w HBM pass.
    * beyond: legacy split at the q = e_lo boundary — stages with q ≥ e_lo
      form the HIGH group (exchange axis E_hi = nb/e_lo, inner I = e_lo·R
      rows), the rest the LOW group (E = e_lo, I = R).  Both sides' stage
      sequences are distance-monotone, so the split is contiguous and
      execution order is preserved.
    """
    if s1 <= s0:
        return (), ()
    if nb <= e_cap:
        steps = tuple((i, q) for i, q in enumerate(qs))
        return ((steps, nb, R),), (_shaped_group_mask(planes, s0, s1, nb, R),)
    if nb <= COARSE_FUSE_NB_CAP:
        e_lo = 1 << ((nb.bit_length() - 1 + 1) // 2)  # ~sqrt(nb), pow2
        e_hi = nb // e_lo
        steps = tuple((i, q) for i, q in enumerate(qs))
        g = _extract_planes(planes, s0, s1)
        P, N = g.shape
        masks = jnp.asarray(g.reshape(P, N // (nb * R * 128), e_hi, e_lo, R * 128))
        return ((steps, (e_hi, e_lo), R),), (masks,)
    n_lo = 1
    while n_lo * n_lo < nb:
        n_lo *= 2
    e_lo = min(n_lo, e_cap)
    e_hi = nb // e_lo
    if e_hi > e_cap:
        raise ValueError(f"nb={nb} exceeds two-level coarse capacity ({e_cap}^2)")
    groups, group_masks = [], []
    hi_sel = [i for i, q in enumerate(qs) if q >= e_lo]
    lo_sel = [i for i, q in enumerate(qs) if q < e_lo]
    for sel, E, I_rows, qdiv in (
        (hi_sel, e_hi, e_lo * R, e_lo),
        (lo_sel, e_lo, R, 1),
    ):
        if not sel:
            continue
        if sel != list(range(sel[0], sel[0] + len(sel))):
            raise AssertionError("coarse stage split is not contiguous")
        steps = tuple((j, qs[i] // qdiv) for j, i in enumerate(sel))
        groups.append((steps, E, I_rows))
        group_masks.append(
            _shaped_group_mask(planes, s0 + sel[0], s0 + sel[-1] + 1, E, I_rows)
        )
    # groups were appended (hi, lo); execution order: distances on the pre
    # side DESCEND (high group first — already correct), on the post side
    # ASCEND (low group must execute first)
    if qs and qs[0] < qs[-1]:
        groups.reverse()
        group_masks.reverse()
    return tuple(groups), tuple(group_masks)


def pack_plan(plan: BenesPlan, block_log2: int = DEFAULT_BLOCK_LOG2) -> BenesPlanPacked:
    """Split a routed plan into coarse/fine stage groups for the TPU apply."""
    return pack_plan_from_planes(
        _packbits_stages(np.asarray(plan.masks)),
        plan.dists,
        plan.n_in,
        plan.n_out,
        block_log2,
    )


def pack_plan_from_planes(
    planes: np.ndarray,
    dists,
    n_in: int,
    n_out: int,
    block_log2: int = DEFAULT_BLOCK_LOG2,
) -> BenesPlanPacked:
    """Build the TPU plan straight from packed stage bit-planes.

    ``planes`` is the (ceil(S/8), N) uint8 form ``_packbits_stages`` emits —
    exactly what the disk cache stores — so a warm start never materializes
    the (S, N) unpacked masks."""
    planes = np.ascontiguousarray(planes).view(np.uint8)
    N = planes.shape[1]
    n = N.bit_length() - 1
    S = len(dists)
    if N <= (1 << block_log2):
        pre = (0, 0)
        fine = (0, S)
        post = (S, S)
        bs = N
    else:
        bs = 1 << block_log2
        n_coarse = n - block_log2
        pre = (0, n_coarse)
        fine = (n_coarse, S - n_coarse)
        post = (S - n_coarse, S)
    nb = N // bs
    R, C = bs // 128, 128
    e_cap = COARSE_E_CAP
    pre_groups, pre_masks = _pack_side(
        pre[0], pre[1], [dists[s] // bs for s in range(*pre)], planes, nb, R, e_cap
    )
    post_groups, post_masks = _pack_side(
        post[0], post[1], [dists[s] // bs for s in range(*post)], planes, nb, R, e_cap
    )
    return BenesPlanPacked(
        fine_dists=tuple(dists[s] for s in range(*fine)),
        pre_groups=pre_groups,
        post_groups=post_groups,
        fine_masks=jnp.asarray(_extract_planes(planes, *fine).reshape(-1, nb, R, C)),
        pre_masks=pre_masks,
        post_masks=post_masks,
        N=N,
        n_in=n_in,
        n_out=n_out,
        block_log2=block_log2,
    )


def _fine_kernel(dists, R, C, reverse, x_ref, m_ref, o_ref):
    """All fine stages for one block; masks arrive as one pipelined VMEM
    block (Pallas double-buffers the copy against the previous block's
    compute — per-stage DMA waits measured ~25 ms/iter of pure latency).
    ``reverse`` walks the SAME mask buffer backwards (palindrome network +
    involution stages = inverse permutation).

    VPU economy: the uint8→int32 mask widening happens once per bit-PLANE
    (8 stages), not per stage, and the direction iotas once per kernel —
    at ~33 fine stages per block the per-stage widen + iota were a third
    of the stage's vector work."""
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[0]
    # Narrow-carry mode: HBM holds bf16, but Mosaic has no bf16 rotate —
    # widen ONCE per block (the roll/select chain then runs in f32) and
    # narrow once at the store.  Exchanges are exact in either width.
    narrow = x.dtype == jnp.bfloat16
    if narrow:
        x = x.astype(jnp.float32)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    S = len(dists)
    planes = range((S + 7) >> 3)
    if reverse:
        planes = reversed(list(planes))
    for p in planes:
        # bit-planes: stage s = bit s&7 of uint8 plane s>>3 (widen for the AND)
        mi = m_ref[p, 0].astype(jnp.int32)
        stages = range(p * 8, min(p * 8 + 8, S))
        if reverse:
            stages = reversed(list(stages))
        for s in stages:
            d = dists[s]
            m = (mi & (1 << (s & 7))) != 0
            if d >= C:
                dr = d // C
                bit = (iota_r & dr) != 0
                fwd = pltpu.roll(x, R - dr, 0)
                bwd = pltpu.roll(x, dr, 0)
            else:
                bit = (iota_c & d) != 0
                fwd = pltpu.roll(x, C - d, 1)
                bwd = pltpu.roll(x, d, 1)
            x = jnp.where(m, jnp.where(bit, bwd, fwd), x)
    o_ref[0] = x.astype(jnp.bfloat16) if narrow else x


def _coarse_kernel(steps, E, x_ref, m_ref, o_ref):
    """All stages of one coarse GROUP, fused over one (E, wr, 128) strip.

    Flat index ``o·(E·I) + e·I + i``: a group stage with roll distance ``q``
    (in E-axis units) pairs element ``(o, e, i)`` with ``(o, e^q, i)`` — a
    pure exchange along the E axis.  One strip of the (O, E, I_rows, 128)
    view therefore sees ALL of the group's stages in VMEM; previously each
    stage was its own roll+select full HBM pass.  ``steps`` is a static tuple
    of (mask_bit, q) in execution order (reverse traversal is encoded by the
    caller, so the mask array never needs flipping on device).

    The minor dim being exactly 128 is load-bearing: XLA's (8, 128) tiling of
    the last two dims is then plain linear flat order, so the reshapes
    from/to the flat vector on either side are free bitcasts (a 2-D operand
    interleaved 8 different blocks per tile and XLA inserted a full-size
    physical relayout copy on BOTH sides of EVERY coarse pass — ~270
    MB/iteration of pure copies at the canonical bench)."""
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[0]
    narrow = x.dtype == jnp.bfloat16  # see _fine_kernel: widen once per strip
    if narrow:
        x = x.astype(jnp.float32)
    wr, C = x.shape[1], x.shape[2]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (E, wr, C), 0)
    cur_plane, mi = -1, None
    for s, q in steps:
        if s >> 3 != cur_plane:  # widen each uint8 bit-plane once, not per stage
            cur_plane = s >> 3
            mi = m_ref[cur_plane, 0].astype(jnp.int32)
        m = (mi & (1 << (s & 7))) != 0
        bit = (iota_b & q) != 0
        fwd = pltpu.roll(x, E - q, 0)
        bwd = pltpu.roll(x, q, 0)
        x = jnp.where(m, jnp.where(bit, bwd, fwd), x)
    o_ref[0] = x.astype(jnp.bfloat16) if narrow else x


def _coarse2_kernel(steps, E_hi, E_lo, x_ref, m_ref, o_ref):
    """All stages of one coarse side, fused over one (E_hi, E_lo, 128) strip.

    The strip is one 128-lane slice of the (O2, E_hi, E_lo, R·128) view: the
    block index of a flat slot is ``e_hi·E_lo + e_lo`` (O2 = 1 when the strip
    covers all block positions), so a stage with block distance ``q`` is a
    pure exchange along E_lo (q < E_lo) or along E_hi by q/E_lo.  Holding
    EVERY block position of the slice in VMEM (nb·128·w bytes) lets the whole
    side — previously two strided passes — run in a single r+w HBM pass.
    DMA efficiency note: the (8, 128) tiled layout of the last two view dims
    means each strip gathers whole 4 KB tiles, not 512 B rows."""
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[0]
    narrow = x.dtype == jnp.bfloat16  # see _fine_kernel: widen once per strip
    if narrow:
        x = x.astype(jnp.float32)
    C = x.shape[2]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (E_hi, E_lo, C), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (E_hi, E_lo, C), 1)
    cur_plane, mi = -1, None
    for s, q in steps:
        if s >> 3 != cur_plane:  # widen each uint8 bit-plane once, not per stage
            cur_plane = s >> 3
            mi = m_ref[cur_plane, 0].astype(jnp.int32)
        m = (mi & (1 << (s & 7))) != 0
        if q >= E_lo:
            qh = q // E_lo
            bit = (iota_h & qh) != 0
            fwd = pltpu.roll(x, E_hi - qh, 0)
            bwd = pltpu.roll(x, qh, 0)
        else:
            bit = (iota_l & q) != 0
            fwd = pltpu.roll(x, E_lo - q, 1)
            bwd = pltpu.roll(x, q, 1)
        x = jnp.where(m, jnp.where(bit, bwd, fwd), x)
    o_ref[0] = x.astype(jnp.bfloat16) if narrow else x


def _apply_coarse_group2(v, masks, steps, E_hi, E_lo, R, interpret):
    """Run one fused two-level coarse pass: ``v`` flat (N,), ``masks``
    (P, O2, E_hi, E_lo, R·128) uint8 bit-planes (pre-shaped at pack time).
    The strip block (1, E_hi, E_lo, 128) holds every block position of one
    lane slice, so all of the side's stages execute in this single pass;
    the carry block is donated (same-index in/out blocks) so the pass runs
    in place."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = masks.shape[0]
    C = 128
    N = v.shape[0]
    O2 = N // (E_hi * E_lo * R * C)
    grid = (O2, R)
    kernel = functools.partial(_coarse2_kernel, steps, E_hi, E_lo)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, E_hi, E_lo, C), lambda o, r: (o, 0, 0, r), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (P, 1, E_hi, E_lo, C),
                lambda o, r: (0, o, 0, 0, r),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, E_hi, E_lo, C), lambda o, r: (o, 0, 0, r), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((O2, E_hi, E_lo, R * C), v.dtype),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(v.reshape(O2, E_hi, E_lo, R * C), masks)
    return out.reshape(-1)


def _apply_coarse_group(v, masks, steps, E, I_rows, interpret):
    """Run one fused coarse-group pass: ``v`` flat (N,), ``masks``
    (P, O, E, I_rows, 128) uint8 bit-planes (pre-shaped at pack time),
    exchange along the E axis of the (O, E, I_rows, 128) view.
    E ≤ COARSE_E_CAP bounds VMEM independently of N.  The carry block is
    donated (``input_output_aliases``): each output block depends only on
    the same-index input block (the exchange happens along E inside the
    VMEM-resident block), so the pass runs in place — no second N-sized
    HBM buffer per application."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = masks.shape[0]
    C = 128
    N = v.shape[0]
    O = N // (E * I_rows * C)
    # Pallas wants the second-to-last block dim ≡ 0 (mod 8) or full; I_rows
    # is a power of two, so wr ∈ {I_rows, 8} always satisfies that.  At
    # E ≤ 256, wr = 8: (in + out + masks, double-buffered) ≲ 5 MB VMEM.
    wr = min(I_rows, 8)
    grid = (O, I_rows // wr)
    kernel = functools.partial(_coarse_kernel, steps, E)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, E, wr, C), lambda o, j: (o, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1, E, wr, C), lambda o, j: (0, o, 0, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, E, wr, C), lambda o, j: (o, 0, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((O, E, I_rows, C), v.dtype),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(v.reshape(O, E, I_rows, C), masks)
    return out.reshape(-1)


def apply_butterfly_tpu(
    plan: "BenesPlan | BenesPlanPacked",
    x: Array,
    reverse: bool = False,
    block_log2: int = DEFAULT_BLOCK_LOG2,
    interpret: bool = False,
    truncate: bool = True,
) -> Array:
    """Blocked application: fine stages in one Pallas kernel per block,
    coarse (cross-block) stages in one fused Pallas pass per GROUP (one
    group per side while nb ≤ COARSE_FUSE_NB_CAP — single-level up to
    COARSE_E_CAP, two-level fused beyond; two groups past the fuse cap) —
    3 HBM passes total up to N ≈ 2^30 at the default block size, 5 up to
    N ≈ 2^33, with VMEM bounded independently of N.

    Prefer passing a ``BenesPlanPacked`` (``pack_plan``) — packing inside a
    compiled iteration loop costs a materialized copy of the (100 MB-scale)
    mask array per application."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not isinstance(plan, BenesPlanPacked):
        plan = pack_plan(plan, block_log2=block_log2)
    N = plan.N
    pad = N - x.shape[0]
    v = jnp.concatenate([x, jnp.zeros(pad, x.dtype)]) if pad else x

    # Coarse groups per side, execution order; reverse swaps the sides,
    # reverses the group order within a side, and the steps within a group.
    pre = list(zip(plan.pre_groups, plan.pre_masks))
    post = list(zip(plan.post_groups, plan.post_masks))
    if reverse:
        pre, post = (
            [((steps[::-1], E, I), m) for (steps, E, I), m in reversed(post)],
            [((steps[::-1], E, I), m) for (steps, E, I), m in reversed(pre)],
        )

    for (steps, E, I_rows), m in pre:
        if isinstance(E, tuple):  # fused two-level side (see _pack_side)
            v = _apply_coarse_group2(v, m, steps, E[0], E[1], I_rows, interpret)
        else:
            v = _apply_coarse_group(v, m, steps, E, I_rows, interpret)

    # --- fine stages: Pallas, grid over blocks -----------------------------
    S_f, nb, R, C = plan.fine_masks.shape
    kernel = functools.partial(_fine_kernel, plan.fine_dists, R, C, reverse)
    # carry donated: block i reads/writes only block i (in-place safe)
    v = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S_f, 1, R, C), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, R, C), v.dtype),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(v.reshape(nb, R, C), plan.fine_masks).reshape(-1)

    for (steps, E, I_rows), m in post:
        if isinstance(E, tuple):  # fused two-level side (see _pack_side)
            v = _apply_coarse_group2(v, m, steps, E[0], E[1], I_rows, interpret)
        else:
            v = _apply_coarse_group(v, m, steps, E, I_rows, interpret)

    if not truncate:
        return v
    return v[: (plan.n_in if reverse else plan.n_out)]
