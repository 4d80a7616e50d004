"""Static permutations as dense grid ops: 3 minor-axis gathers + 2 transposes.

TPU has no hardware gather/scatter: XLA lowers a flat ``x[perm]`` over
millions of elements to a near-serial loop (~25 ns/element measured, ~100×
slower than streaming).  But a *static* permutation needs none of that
generality.  View the N = S·S vector as an (S, S) grid; by the classic
Clos-network / König edge-coloring argument, ANY permutation factors as

    within-row permute  →  transpose  →  within-row permute  →  transpose
    →  within-row permute

where each within-row step is ``jnp.take_along_axis(v, idx, axis=-1)`` — a
batched gather along the **minor** axis, which XLA/Mosaic vectorizes — and
the transposes are tiled dense copies.  Five regular passes over the data
instead of N serialized lookups.

Routing (computing the three index grids) happens once at ingestion: build
the bipartite multigraph source-row → destination-row (one edge per element;
it is S-regular), S-edge-color it by recursive Euler splitting (König), and
read the three stage indices off the coloring.  O(N log S) host time.

Used by the matching objective's ``layout="row"`` path to carry z from row
tiles into column tiles and a·x back — see ``rowmajor.py``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class GridPerm(NamedTuple):
    """Device-side factorization of ``y = x_padded[perm]`` on an (S, S) grid."""

    idx1: Array  # (S, S) int32 — stage-1 within-row gather
    idx2: Array  # (S, S) int32 — stage-2 within-row gather (on the transpose)
    idx3: Array  # (S, S) int32 — stage-3 within-row gather
    n_in: int  # valid input length (x is zero-padded to S*S)
    n_out: int  # valid output length


def _euler_split(rs: np.ndarray, rd: np.ndarray, S: int) -> np.ndarray:
    """S-edge-color the S-regular bipartite multigraph {rs[e] → rd[e]}.

    Recursive Euler splitting (König): orient each connected component's
    Eulerian circuit; alternating edges go to the two halves; recurse
    log2(S) times.  Returns the color (0..S-1) per edge.
    """
    E = rs.size
    colors = np.zeros(E, dtype=np.int64)
    # frontier: list of (edge_ids, width) subproblems, each width-regular
    stack = [(np.arange(E, dtype=np.int64), S)]
    while stack:
        edges, width = stack.pop()
        if width == 1:
            continue
        half = width // 2
        # --- Eulerian orientation of this sub-multigraph -------------------
        # adjacency: for each vertex, the incident edge list.  Left vertices
        # are 0..S-1, right vertices S..2S-1.
        e_rs = rs[edges]
        e_rd = rd[edges] + S
        m = edges.size
        # each edge appears in both endpoint lists
        deg_order = np.argsort(np.concatenate([e_rs, e_rd]), kind="stable")
        inc_edge = np.concatenate([np.arange(m), np.arange(m)])[deg_order]
        inc_vert = np.concatenate([e_rs, e_rd])[deg_order]
        # CSR over vertices
        starts = np.searchsorted(inc_vert, np.arange(2 * S))
        ends = np.searchsorted(inc_vert, np.arange(2 * S) + 1)
        ptr = starts.copy()
        used = np.zeros(m, dtype=bool)
        side = np.empty(m, dtype=bool)  # True: traversed left→right
        # iterative Hierholzer over all components; every vertex has even
        # degree (width-regular bipartite), so circuits exist.
        other = np.empty(m, dtype=np.int64)
        for start_v in range(2 * S):
            while ptr[start_v] < ends[start_v]:
                # walk a circuit from start_v
                v = start_v
                while True:
                    # advance past used incident edges
                    p = ptr[v]
                    while p < ends[v] and used[inc_edge[p]]:
                        p += 1
                    ptr[v] = p
                    if p >= ends[v]:
                        break  # circuit closed (back at a saturated vertex)
                    e = inc_edge[p]
                    ptr[v] = p + 1
                    used[e] = True
                    left = e_rs[e]
                    right = e_rd[e]
                    if v == left:
                        side[e] = True
                        v = right
                    else:
                        side[e] = False
                        v = left
        part0 = edges[side]
        part1 = edges[~side]
        colors[part1] += half
        stack.append((part0, half))
        stack.append((part1, half))
    return colors


def factor_permutation(perm: np.ndarray, S: int | None = None) -> GridPerm:
    """Factor ``y = x[perm]`` into the 3-gather/2-transpose grid form.

    ``perm`` maps output position → input position (``y[i] = x[perm[i]]``).
    Inputs/outputs are zero-padded to S*S; padding routes identically
    (identity on the leftover slots).
    """
    perm = np.asarray(perm, dtype=np.int64)
    n_out = perm.size
    n_in = int(perm.max()) + 1 if perm.size else 0
    if S is None:
        S = 1 << int(np.ceil(np.ceil(np.log2(max(n_out, n_in, 2))) / 2))
    N = S * S
    if max(n_out, n_in) > N:
        raise ValueError(f"grid {S}x{S} too small for {max(n_out, n_in)} elements")

    # total permutation on N slots: outputs 0..n_out-1 read perm; the spare
    # slots read the unused inputs (any bijection works; fill greedily).
    full = np.full(N, -1, dtype=np.int64)
    full[:n_out] = perm
    used = np.zeros(N, dtype=bool)
    used[perm] = True
    full[n_out:] = np.nonzero(~used)[0]

    src = full  # source slot per destination slot
    dst = np.arange(N, dtype=np.int64)
    rs, cs = src // S, src % S
    rd, cd = dst // S, dst % S

    color = _euler_split(rs, rd, S)

    idx1 = np.empty((S, S), dtype=np.int64)
    idx2 = np.empty((S, S), dtype=np.int64)
    idx3 = np.empty((S, S), dtype=np.int64)
    # stage 1: A[rs, k] = x[rs, cs]  →  idx1[rs, k] = cs
    idx1[rs, color] = cs
    # stage 2 (on the transpose): Bt[k, rd] = At[k, rs]  →  idx2[k, rd] = rs
    idx2[color, rd] = rs
    # stage 3: y[rd, cd] = B[rd, k]  →  idx3[rd, cd] = k
    idx3[rd, cd] = color

    return GridPerm(
        idx1=jnp.asarray(idx1.astype(np.int32)),
        idx2=jnp.asarray(idx2.astype(np.int32)),
        idx3=jnp.asarray(idx3.astype(np.int32)),
        n_in=n_in,
        n_out=n_out,
    )


def apply_grid_perm(gp: GridPerm, x: Array, n_out: int | None = None) -> Array:
    """Apply the factored permutation: returns ``x_padded[perm][:n_out]``."""
    S = gp.idx1.shape[0]
    N = S * S
    pad = N - x.shape[0]
    v = jnp.concatenate([x, jnp.zeros(pad, x.dtype)]) if pad else x
    v = v.reshape(S, S)
    v = jnp.take_along_axis(v, gp.idx1, axis=-1).T
    v = jnp.take_along_axis(v, gp.idx2, axis=-1).T
    v = jnp.take_along_axis(v, gp.idx3, axis=-1)
    out = v.reshape(-1)
    n = gp.n_out if n_out is None else n_out
    return out[:n]
