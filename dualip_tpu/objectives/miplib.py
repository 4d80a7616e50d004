"""General-LP (MIPLIB-2017) dual objective + PDLP convergence certificate.

Parity: reference ``objectives/miplib.py`` — dense or sparse A, indexed
projections, optional internal Jacobi row scaling, and the PDLP stopping
criterion (Applegate et al. 2022, Eq. 6a-6b) with bound-dual clamping
(reference ``miplib.py:60-230``).

TPU-native design:

* Dense A: ``A.T @ λ`` and ``A @ x`` are plain matmuls → MXU.  Sparse A is
  held as COO index/value arrays; both matvecs are gather + ``segment_sum``.
* The per-entry indexed projections (reference ``miplib.py:79-90`` looped and
  fancy-indexed on device) become static-index ``.at[idx].set`` updates —
  traced once, fused by XLA.
* Fixes two reference defects (SURVEY.md §2.6): Jacobi preconditioning works
  for sparse A as well (the reference raised NotImplementedError,
  ``miplib.py:51-52``), and ``invert_jacobi_precondition`` actually exists
  (the reference's ``run_solver.py:141`` called a method defined nowhere).
* Bound keys: accepts both the ``"l"``/``"u"`` and ``"lower"``/``"upper"``
  spellings (reference defect §2.6.4).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from dualip_tpu.objectives.base import BaseInputArgs, BaseObjective
from dualip_tpu.projections.base import ProjectionEntry, project
from dualip_tpu.sparse.csc import CSCMatrix, csc_col_ids, row_norms_csc
from dualip_tpu.types import ObjectiveResult

Array = jax.Array


@dataclass
class MIPLIBInputArgs(BaseInputArgs):
    """Input for the MIPLIB objective (reference ``miplib.py:11-25``)."""

    A: Union[np.ndarray, CSCMatrix]
    c: np.ndarray
    projection_map: Dict[str, ProjectionEntry]
    b_vec: np.ndarray
    equality_mask: Optional[np.ndarray] = None


class _DenseOps:
    """Dense A: matvecs on the MXU.

    With a mesh, A is device_put sharded along the variable (column) axis and
    the matvecs stay plain matmuls — XLA's SPMD partitioner runs them on local
    column blocks and inserts the all-reduce / all-gather (the dense analog of
    the reference's entity-column sharding, ``dist_utils.py:28-71``, which the
    reference never wired to its general-LP objective).
    """

    def __init__(self, A: np.ndarray, dtype, mesh=None):
        self.A = jnp.asarray(np.asarray(A, dtype=dtype))
        self.shape = self.A.shape
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self.A = jax.device_put(
                self.A, NamedSharding(mesh, PartitionSpec(None, mesh.axis_names[0]))
            )

    def matvec(self, x: Array) -> Array:  # A @ x
        return self.A @ x

    def rmatvec(self, y: Array) -> Array:  # A.T @ y
        return self.A.T @ y

    def row_norms(self) -> np.ndarray:
        return np.linalg.norm(np.asarray(self.A), axis=1)


class _SparseOps:
    """COO A, single device: gather + segment_sum matvecs."""

    def __init__(self, A: CSCMatrix, dtype):
        self.shape = A.shape
        self.rows = jnp.asarray(A.row_indices.astype(np.int32))
        self.cols = jnp.asarray(csc_col_ids(A).astype(np.int32))
        self.vals = jnp.asarray(A.data.astype(dtype))
        self._host = A

    def matvec(self, x: Array) -> Array:
        return jax.ops.segment_sum(self.vals * x[self.cols], self.rows, num_segments=self.shape[0])

    def rmatvec(self, y: Array) -> Array:
        return jax.ops.segment_sum(self.vals * y[self.rows], self.cols, num_segments=self.shape[1])

    def row_norms(self) -> np.ndarray:
        return row_norms_csc(self._host)


class _ColShardedSparseOps:
    """Column-sharded COO A over a 1-D mesh: O(m) per-iteration communication.

    The round-3 formulation sharded the triplets by nnz, which forced a psum
    of the FULL (n,)-vector ``A^T λ`` every iteration — violating the design
    law that per-iteration communication is O(m), independent of n (SURVEY
    §2.2; reference ``docs/solver/index.rst:128-130``; the reference's
    matching path obeys it, ``matching.py:272-277``).  Sharding by variable
    COLUMNS (the reference's own entity-sharding rule,
    ``dist_utils.py:28-71``, extended to the general-LP objective) keeps
    ``A^T λ``, ``z``, the projections, and ``x`` entirely shard-local; the
    only per-iteration collectives are one psum of the (m,)-vector ``A·x``
    and two scalar psums (``c·x`` and ``‖x‖²``).

    Projection entries are remapped to shard-local indices, padded with an
    out-of-range sentinel (reads clamp, scatter ``mode="drop"``), so
    elementwise projections (box / cone / identity) may span shards freely.
    A joint projection (simplex family — couples its coordinates through a
    sum constraint) must live entirely inside one shard: padding would
    change its value, so the column split SNAPS to joint-entry hull
    boundaries (shards go slightly uneven instead of raising — VERDICT r4
    #8; each shard is padded to the widest shard so SPMD keeps one program).
    Only a joint entry whose hull is wider than the whole problem-per-shard
    budget can still fail, and that raises with the offending entry named.
    """

    _ELEMENTWISE = ("box", "cone", "identity")

    @staticmethod
    def _snap_bounds(n: int, S: int, atoms) -> np.ndarray:
        """Shard cut points [0, b_1, …, b_{S-1}, n] with every cut moved out
        of any joint-entry hull (atoms = merged, sorted (lo, hi) half-open
        intervals).  Even split when no atom is in the way."""
        bounds = [0]
        for s in range(1, S):
            t = round(s * n / S)
            t = max(t, bounds[-1])
            for lo, hi in atoms:
                if lo < t < hi:  # inside a hull: snap to the nearer edge
                    t = lo if (t - lo) <= (hi - t) else hi
                    break
            bounds.append(max(t, bounds[-1]))
        bounds.append(n)
        return np.asarray(bounds, dtype=np.int64)

    def __init__(self, A: CSCMatrix, c: np.ndarray, projection_map, dtype, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.shape = A.shape
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        m, n = A.shape
        S = int(np.prod(mesh.devices.shape))
        sh = NamedSharding(mesh, P(self.axis))
        self._rep = NamedSharding(mesh, P())

        # Joint-entry hulls (interval span of each coupling entry's indices),
        # merged where overlapping; shard cuts snap to their boundaries.
        hulls = []
        for key, entry in projection_map.items():
            idx = np.asarray(entry.indices, dtype=np.int64)
            if idx.size and entry.proj_type not in self._ELEMENTWISE:
                hulls.append((int(idx.min()), int(idx.max()) + 1))
        hulls.sort()
        atoms = []
        for lo, hi in hulls:
            if atoms and lo < atoms[-1][1]:
                atoms[-1] = (atoms[-1][0], max(atoms[-1][1], hi))
            else:
                atoms.append((lo, hi))
        bounds = self._snap_bounds(n, S, atoms)
        widths = np.diff(bounds)
        n_local = max(int(widths.max()), 1)
        self.n_local, self.n_shards = n_local, S
        self._bounds = bounds

        col_ids = csc_col_ids(A)
        rows_l, cols_l, vals_l = [], [], []
        for s in range(S):
            c0, c1 = int(bounds[s]), int(bounds[s + 1])
            lo, hi = int(A.indptr[c0]), int(A.indptr[c1])
            rows_l.append(A.row_indices[lo:hi].astype(np.int32))
            cols_l.append((col_ids[lo:hi] - c0).astype(np.int32))
            vals_l.append(np.asarray(A.data[lo:hi], dtype=dtype))
        nnz_l = max(max(r.size for r in rows_l), 1)

        def _stack(parts, fill, dt):
            out = np.full((S, nnz_l), fill, dtype=dt)
            for s, p in enumerate(parts):
                out[s, : p.size] = p
            return out

        # padding triplets carry vals=0 at (row 0, col 0): no contribution
        self.rows = jax.device_put(jnp.asarray(_stack(rows_l, 0, np.int32)), sh)
        self.cols = jax.device_put(jnp.asarray(_stack(cols_l, 0, np.int32)), sh)
        self.vals = jax.device_put(jnp.asarray(_stack(vals_l, 0, dtype)), sh)

        c_pad = np.zeros((S, n_local), dtype=dtype)
        for s in range(S):
            c_pad[s, : widths[s]] = np.asarray(c[bounds[s] : bounds[s + 1]], dtype=dtype)
        self.c_sh = jax.device_put(jnp.asarray(c_pad), sh)
        # per-shard global column start (rare-path matvec) and the flat
        # positions of real (non-padding) columns in the (S, n_local) packing
        self._c0_sh = jax.device_put(jnp.asarray(bounds[:-1].astype(np.int32)), sh)
        unpad = np.concatenate(
            [s * n_local + np.arange(widths[s], dtype=np.int64) for s in range(S)]
        )
        self._unpad_idx = jnp.asarray(unpad.astype(np.int32))

        # Per-entry shard-local index blocks (S, Lmax); sentinel = n_local.
        self._proj_idx, self._proj_fns = [], []
        for key, entry in projection_map.items():
            idx = np.asarray(entry.indices, dtype=np.int64)
            if idx.size == 0:
                continue
            per_shard = [
                idx[(idx >= bounds[s]) & (idx < bounds[s + 1])] - bounds[s]
                for s in range(S)
            ]
            joint = entry.proj_type not in self._ELEMENTWISE
            if joint and sum(1 for p in per_shard if p.size) > 1:
                raise ValueError(
                    f"projection entry {key!r} ({entry.proj_type}) couples its "
                    f"coordinates over an index hull too wide to fit any "
                    f"snapped column shard (n={n}, {S} shards); use fewer "
                    f"devices or the matching objective's entity-block "
                    f"sharding for per-entity polytopes"
                )
            l_max = max(max(p.size for p in per_shard), 1)
            blk = np.full((S, l_max), n_local, dtype=np.int32)
            for s, p in enumerate(per_shard):
                blk[s, : p.size] = p
            self._proj_idx.append(jax.device_put(jnp.asarray(blk), sh))
            self._proj_fns.append(project(entry.proj_type, **entry.proj_params))
        self._host = A
        self._fused_jit = None

    # -- the per-iteration fused body: z → project → (Ax, c·x, ‖x‖², x) -----
    def fused_iteration(self, dual_val: Array, g: Array):
        from jax.sharding import PartitionSpec as P

        axis, n_local, m = self.axis, self.n_local, self.shape[0]
        n_proj = len(self._proj_idx)

        def body(rows, cols, vals, c_l, *rest):
            rows, cols, vals, c_l = rows[0], cols[0], vals[0], c_l[0]
            proj_blocks, (y, g) = rest[:n_proj], rest[n_proj:]
            aty = jax.ops.segment_sum(vals * y[rows], cols, num_segments=n_local)
            z = (-1.0 / g) * (aty + c_l)
            x = z
            for blk, fn in zip(proj_blocks, self._proj_fns):
                idx = blk[0]  # sentinel n_local: reads clamp, writes drop
                x = x.at[idx].set(fn(x[idx]), mode="drop")
            ax = jax.lax.psum(
                jax.ops.segment_sum(vals * x[cols], rows, num_segments=m), axis
            )
            cx = jax.lax.psum(jnp.dot(c_l, x), axis)
            xx = jax.lax.psum(jnp.dot(x, x), axis)
            return ax, cx, xx, x[None]

        sharded = P(axis)
        fn = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(sharded, sharded, sharded, sharded)
            + (sharded,) * n_proj
            + (P(), P()),
            out_specs=(P(), P(), P(), sharded),
        )
        return fn(self.rows, self.cols, self.vals, self.c_sh, *self._proj_idx, dual_val, g)

    def gather_primal(self, x_sh: Array) -> Array:
        """(S, n_local) shard-local primal → global (n,) (all-gather; used
        only on demand — save_primal / certificate — never per iteration).
        ``_unpad_idx`` drops each shard's padding tail (shards are uneven
        after boundary snapping)."""
        return x_sh.reshape(-1)[self._unpad_idx]

    # -- rare-path matvecs (PDLP certificate, row norms) --------------------
    def matvec(self, x: Array) -> Array:
        from jax.sharding import PartitionSpec as P

        axis, m = self.axis, self.shape[0]

        def body(rows, cols, vals, c0s, x):
            part = jax.ops.segment_sum(
                vals[0] * x[cols[0] + c0s[0]], rows[0], num_segments=m
            )
            return jax.lax.psum(part, axis)

        return jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P()), out_specs=P(),
        )(self.rows, self.cols, self.vals, self._c0_sh, x)

    def rmatvec(self, y: Array) -> Array:
        from jax.sharding import PartitionSpec as P

        axis, n_local = self.axis, self.n_local

        def body(rows, cols, vals, y):
            return jax.ops.segment_sum(
                vals[0] * y[rows[0]], cols[0], num_segments=n_local
            )

        out = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(axis), P()), out_specs=P(axis),
        )(self.rows, self.cols, self.vals, y)
        return out[self._unpad_idx]

    def row_norms(self) -> np.ndarray:
        return row_norms_csc(self._host)


class _ButterflySparseOps:
    """Scatter/gather-free sparse matvecs via the Beneš dual layout.

    Same machinery as the matching fast path (``dualip_tpu/sparse/rowmajor.py``,
    ``dualip_tpu/ops/butterfly.py``): A's nonzeros live in dense column tiles
    and a row-major companion, connected by one static Beneš plan.
    ``rmatvec`` computes ``a·λ[row]`` in row space (the dual value is constant
    per sublane — a broadcast, not a gather), carries it to column space, and
    lane-reduces per column; ``matvec`` broadcasts x per column slot, carries
    ``a·x`` back, and lane-reduces per row.  The reference's per-nnz
    ``index_select``/``scatter_add`` pair (reference ``miplib.py:76,93``) —
    near-serial on TPU — is replaced by two streaming permutation applies.
    Single mesh device; the mesh path keeps the COO shard_map formulation.
    """

    def __init__(self, A: CSCMatrix, dtype, plan_cache_dir=None):
        from dualip_tpu.projections.base import ProjectionEntry
        from dualip_tpu.sparse.bcsc import build_blockcsc
        from dualip_tpu.sparse.rowmajor import build_row_layout

        self.shape = A.shape
        m, n = A.shape
        # The tile grouping needs a projection map only for nnz bucketing;
        # the objective's real indexed projections stay on the (n,) vector.
        pm = {"all": ProjectionEntry("identity", {}, np.arange(n))}
        zeros_c = CSCMatrix(
            indptr=A.indptr, row_indices=A.row_indices,
            data=np.zeros_like(np.asarray(A.data)), shape=A.shape,
        )
        bcsc = build_blockcsc(
            A, zeros_c, pm, batching=True, pad_cols_to=1024, keep_flat_idx=False, dtype=dtype
        )
        self.rl = build_row_layout(bcsc, method="butterfly", plan_cache_dir=plan_cache_dir)

        # Column-slot metadata: slot s holds tile t's column k (concat order);
        # colpos maps variable id -> its slot in the per-column sums concat
        # (sentinel = zero for variables with no nonzeros).
        colpos = np.full(n, sum(int(t.col_ids.shape[0]) for t in bcsc.tiles), dtype=np.int64)
        ids = []
        off = 0
        for t in bcsc.tiles:
            cid = np.asarray(t.col_ids)
            valid = cid >= 0
            colpos[cid[valid]] = off + np.nonzero(valid)[0]
            ids.append(np.maximum(cid, 0))  # padding cols: gather x[0], a=0 kills it
            off += cid.shape[0]
        self.colpos = jnp.asarray(colpos.astype(np.int32))
        self.col_ids_cat = jnp.asarray(np.concatenate(ids).astype(np.int32))
        self._host = A

    def _carry(self, vec: Array, reverse: bool) -> Array:
        from dualip_tpu.ops.butterfly import apply_butterfly, apply_butterfly_tpu

        if self.rl.use_tpu_kernel:
            return apply_butterfly_tpu(self.rl.plan, vec, reverse=reverse)
        return apply_butterfly(self.rl.plan, vec, reverse=reverse)

    def rmatvec(self, y: Array) -> Array:
        rl = self.rl
        # srow carry (see sparse/rowmajor.py::RowTile): ship the masked dual
        # broadcast; a is applied from the column-side tiles after the carry,
        # so row-space copies of a never exist.
        t_parts = []
        for rt, (R, Lr) in zip(rl.row_tiles, rl.row_shapes):
            lane = jax.lax.broadcasted_iota(jnp.int32, (R, Lr), 1)
            s = jnp.where(
                lane < rt.length[:, None], y[rt.row_ids][:, None], jnp.zeros((), y.dtype)
            )
            t_parts.append(s.reshape(-1))
        t_col = self._carry(jnp.concatenate(t_parts), reverse=False)
        sums = []
        for pt, off in zip(rl.col_tiles_T, rl.col_offsets):
            KP, L, C = pt.a.shape
            L2 = (1 << max(L - 1, 0).bit_length()) if L > 1 else 1
            region = t_col[off : off + KP * L2 * C].reshape(KP, L2, C)
            # a ⊙ carried-λ, lane-reduced over the L real lanes; (KP, C)
            # flattens to column order
            sums.append(jnp.sum(pt.a * region[:, :L, :], axis=1).reshape(-1))
        sums_cat = jnp.concatenate(sums + [jnp.zeros(1, y.dtype)])
        return sums_cat[self.colpos]

    def matvec(self, x: Array) -> Array:
        rl = self.rl
        xg = x[self.col_ids_cat]  # (Σ K,) — an n-scale gather, not nnz-scale
        pieces = []  # (region_off, flat panel-layout values)
        off = 0
        for pt, roff in zip(rl.col_tiles_T, rl.col_offsets):
            KP, L, C = pt.a.shape
            L2 = (1 << max(L - 1, 0).bit_length()) if L > 1 else 1
            u = pt.a * xg[off : off + KP * C].reshape(KP, 1, C)
            if L2 > L:  # ghost lanes carry zeros
                u = jnp.pad(u, ((0, 0), (0, L2 - L), (0, 0)))
            pieces.append((roff, u.reshape(-1)))
            off += KP * C
        # regions are contiguous in descending-L2 offset order
        u_parts = [p for _, p in sorted(pieces, key=lambda t: t[0])]
        u_row = self._carry(jnp.concatenate(u_parts), reverse=True)
        sums = []
        off = 0
        for R, Lr in rl.row_shapes:
            sums.append(jnp.sum(u_row[off : off + R * Lr].reshape(R, Lr), axis=1))
            off += R * Lr
        sums_cat = jnp.concatenate(sums + [jnp.zeros(1, x.dtype)])
        return sums_cat[rl.row_pos]

    def row_norms(self) -> np.ndarray:
        return row_norms_csc(self._host)


def _param_bound(params: dict, short: str, long: str):
    if short in params:
        return params[short]
    if long in params:
        return params[long]
    return None


class MIPLIB2017ObjectiveFunction(BaseObjective):
    """General-LP dual objective (reference ``miplib.py:28-109``).

    Pass ``mesh`` (1-D ``jax.sharding.Mesh``) to shard A over the mesh — dense
    A by variable columns (GSPMD matmuls), sparse A by variable columns under
    ``shard_map`` (``_ColShardedSparseOps``: shard-local ``A^T λ``/projection/
    ``x``, one (m,)-psum + two scalar psums per iteration) — with duals/b
    replicated.  The reference's general-LP objective was single-device only;
    this extends the reference's entity-sharding strategy (its only
    parallelism axis, SURVEY §2.3) to the general-LP path while keeping its
    O(m) communication law (reference ``docs/solver/index.rst:128-130``).
    """

    def __init__(
        self,
        miplib_input_args: MIPLIBInputArgs,
        use_jacobi_precondition: bool = False,
        dtype=np.float32,
        mesh=None,
        layout: str = "coo",
        plan_cache_dir=None,
    ):
        args = miplib_input_args
        self._sparse = isinstance(args.A, CSCMatrix)
        self.mesh = mesh
        if layout not in ("coo", "butterfly"):
            raise ValueError(f"Unknown layout {layout!r} (expected 'coo' or 'butterfly')")
        if layout == "butterfly" and (not self._sparse or mesh is not None):
            raise ValueError("layout='butterfly' needs sparse A and mesh=None")
        if layout == "butterfly":
            self.ops = _ButterflySparseOps(args.A, dtype, plan_cache_dir=plan_cache_dir)
        elif self._sparse and mesh is not None:
            self.ops = _ColShardedSparseOps(
                args.A, args.c, args.projection_map, dtype, mesh
            )
        else:
            self.ops = (
                _SparseOps(args.A, dtype) if self._sparse else _DenseOps(args.A, dtype, mesh=mesh)
            )
        self.c = jnp.asarray(np.asarray(args.c, dtype=dtype))
        self.b_vec = jnp.asarray(np.asarray(args.b_vec, dtype=dtype))
        self.projection_map = args.projection_map
        self.equality_mask = (
            jnp.asarray(np.asarray(args.equality_mask)) if args.equality_mask is not None else None
        )
        if mesh is not None:
            # Duals, costs, and bounds replicate over the mesh; only A shards.
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(mesh, PartitionSpec())
            self.c = jax.device_put(self.c, rep)
            self.b_vec = jax.device_put(self.b_vec, rep)
            if self.equality_mask is not None:
                self.equality_mask = jax.device_put(self.equality_mask, rep)
        self.use_jacobi_precondition = use_jacobi_precondition

        lower, upper = self._construct_variable_lower_upper_bound()
        self.lower = jnp.asarray(lower)
        self.upper = jnp.asarray(upper)

        if use_jacobi_precondition:
            rn = self.ops.row_norms()
            rn = np.where(rn == 0, 1.0, rn)  # guard all-zero rows (reference miplib.py:55-56)
            self.row_norms = jnp.asarray(rn.astype(dtype))
        else:
            self.row_norms = None

        # Static per-entry index arrays for the projection pass.
        self._proj_entries = []
        for _, entry in self.projection_map.items():
            idx = np.asarray(entry.indices, dtype=np.int32)
            if idx.size:
                self._proj_entries.append((jnp.asarray(idx), project(entry.proj_type, **entry.proj_params)))

    # ------------------------------------------------------------------
    @property
    def params(self):
        return ()

    def _project(self, z: Array) -> Array:
        """Indexed projections (reference ``miplib.py:79-90``)."""
        out = z
        for idx, proj_fn in self._proj_entries:
            out = out.at[idx].set(proj_fn(out[idx]))
        return out

    def calculate_traceable(self, params, dual_val: Array, gamma) -> ObjectiveResult:
        res, _ = self._calculate_full(dual_val, gamma)
        return res

    def _calculate_full(self, dual_val: Array, gamma) -> Tuple[ObjectiveResult, Array]:
        """Reference ``miplib.py:60-109``, identical op structure."""
        if self.row_norms is not None:
            dual_val = (1.0 / self.row_norms) * dual_val

        g = jnp.asarray(gamma, dtype=dual_val.dtype)

        if isinstance(self.ops, _ColShardedSparseOps):
            # Fused shard-local z→project→x with exactly one (m,)-psum and
            # two scalar psums per iteration (O(m) communication law).
            ax, cx, xx, x_sh = self.ops.fused_iteration(dual_val, g)
            Ax_minus_b = ax - self.b_vec
            if self.row_norms is not None:
                dual_gradient = (1.0 / self.row_norms) * Ax_minus_b
            else:
                dual_gradient = Ax_minus_b
            reg_penalty = (g / 2.0) * xx
            dual_obj = cx + reg_penalty + dual_val @ Ax_minus_b
            res = ObjectiveResult(
                dual_gradient=dual_gradient, dual_objective=dual_obj, reg_penalty=reg_penalty
            )
            return res, x_sh

        z = (-1.0 / g) * (self.ops.rmatvec(dual_val) + self.c)
        projected = self._project(z)

        Ax_minus_b = self.ops.matvec(projected) - self.b_vec
        if self.row_norms is not None:
            dual_gradient = (1.0 / self.row_norms) * Ax_minus_b
        else:
            dual_gradient = Ax_minus_b

        reg_penalty = (g / 2.0) * jnp.sum(projected * projected)
        dual_obj = self.c @ projected + reg_penalty + dual_val @ Ax_minus_b
        res = ObjectiveResult(
            dual_gradient=dual_gradient, dual_objective=dual_obj, reg_penalty=reg_penalty
        )
        return res, projected

    def calculate(
        self,
        dual_val: Array,
        gamma: float,
        save_primal: bool = False,
        rank: int = 0,
        **kwargs,
    ) -> ObjectiveResult:
        del rank, kwargs
        dual_val = jnp.asarray(dual_val)
        if not hasattr(self, "_jit_calc"):
            self._jit_calc = jax.jit(self._calculate_full)
        g = gamma if isinstance(gamma, jax.Array) else jnp.asarray(np.float32(gamma))
        res, projected = self._jit_calc(dual_val, g)
        if save_primal:
            if isinstance(self.ops, _ColShardedSparseOps):
                projected = self.ops.gather_primal(projected)
            res.primal_var = projected
            res.primal_objective = self.c @ projected
        return res

    # ------------------------------------------------------------------
    def invert_jacobi_precondition(self, dual_val: Array, dual_grad: Array):
        """Map a dual/gradient pair from the row-scaled problem back to the
        original scaling.  With D = diag(1/row_norms), the solved problem is
        (DA) x <= Db, so λ_orig = D λ' and grad_orig = D^{-1} grad'.

        The reference's ``run_solver`` called this method but never defined it
        (reference ``run_solver.py:141``, defect SURVEY.md §2.6.2).
        """
        if self.row_norms is None:
            return dual_val, dual_grad
        return (1.0 / self.row_norms) * dual_val, self.row_norms * dual_grad

    # ------------------------------------------------------------------
    def _construct_variable_lower_upper_bound(self):
        """Per-variable (l, u) from box/cone params (reference ``miplib.py:111-121``);
        NaN == absent."""
        n = np.asarray(self.c).shape[0]
        lower = np.full(n, np.nan, dtype=np.float32)
        upper = np.full(n, np.nan, dtype=np.float32)
        for _, entry in self.projection_map.items():
            idx = np.asarray(entry.indices, dtype=np.int64)
            lo = _param_bound(entry.proj_params, "l", "lower")
            up = _param_bound(entry.proj_params, "u", "upper")
            if lo is not None:
                lower[idx] = lo
            if up is not None:
                upper[idx] = up
        return lower, upper

    def convergence_stop_condition(self, tol: float, gamma: float):
        """A ``stop_condition`` callable for ``AcceleratedGradientDescent``:
        certifies the current dual with the PDLP test, recovering the primal
        from the γ-regularized subproblem at the current dual (the
        reduced-cost recovery ``where(r>=0, l, u)`` is degenerate once
        ``r → 0``, which is why the reference's own tests always passed an
        explicit x, ``test_miplib_objective.py:126-130``)."""

        def stop(iteration: int, dual_val: Array) -> bool:
            del iteration
            res = self.calculate(dual_val, gamma=gamma, save_primal=True)
            *_, converged = self.calculate_convergence_bound(
                dual_val, x=res.primal_var, tol=tol
            )
            return converged

        return stop

    @staticmethod
    def _clamp_x_bound_duals(x_bound_duals: Array, l_mask_exists: Array, u_mask_exists: Array) -> Array:
        """Project bound-duals onto Λ (reference ``miplib.py:123-154``):
        l-only -> >= 0; u-only -> <= 0; neither -> 0; both -> free."""
        zero = jnp.zeros((), dtype=x_bound_duals.dtype)
        out = x_bound_duals
        out = jnp.where(l_mask_exists & ~u_mask_exists, jnp.maximum(out, zero), out)
        out = jnp.where(~l_mask_exists & u_mask_exists, jnp.minimum(out, zero), out)
        out = jnp.where(~l_mask_exists & ~u_mask_exists, zero, out)
        return out

    def calculate_convergence_bound(
        self,
        dual_val: Array,
        x: Optional[Array] = None,
        optimal_primal_obj: Optional[float] = None,
        tol: float = 1e-4,
    ):
        """PDLP stopping test (reference ``miplib.py:156-230``).

        Returns (gap_upperbound, gap_lowerbound, primal_feas, dual_feas,
        converged); ``converged`` is a Python bool.
        """
        dual_val = jnp.asarray(dual_val)
        if self.row_norms is not None:
            dual_val = (1.0 / self.row_norms) * dual_val

        r = self.c + self.ops.rmatvec(dual_val)  # reduced cost

        if x is None:
            x = jnp.where(r >= 0, self.lower, self.upper)
            if bool(jnp.isnan(x).any()):
                raise ValueError("Unbounded x.")
        else:
            x = jnp.asarray(x)

        lambda_neg = jnp.minimum(r, 0.0)
        lambda_pos = jnp.maximum(r, 0.0)

        u_exists = ~jnp.isnan(self.upper)
        l_exists = ~jnp.isnan(self.lower)

        lambda_u = jnp.sum(jnp.where(u_exists, lambda_neg * jnp.nan_to_num(self.upper), 0.0))
        lambda_l = jnp.sum(jnp.where(l_exists, lambda_pos * jnp.nan_to_num(self.lower), 0.0))
        d = -jnp.dot(self.b_vec, dual_val) + lambda_u + lambda_l

        p = jnp.dot(self.c, x)
        gap_upperbound = jnp.abs(p - d) / (1.0 + jnp.abs(p) + jnp.abs(d))

        if optimal_primal_obj is not None:
            opt = jnp.asarray(optimal_primal_obj, dtype=p.dtype)
            gap_lower_bound = jnp.abs(p - opt) / (1.0 + jnp.abs(p) + jnp.abs(opt))
        else:
            gap_lower_bound = jnp.asarray(jnp.nan)

        Ax_minus_b = self.ops.matvec(x) - self.b_vec
        if self.equality_mask is None:
            row_violation = jnp.maximum(Ax_minus_b, 0.0)
        else:
            row_violation = jnp.where(self.equality_mask, jnp.abs(Ax_minus_b), jnp.maximum(Ax_minus_b, 0.0))
        primal_feas = jnp.linalg.norm(row_violation) / (1.0 + jnp.linalg.norm(self.b_vec))

        x_bound_duals = self._clamp_x_bound_duals(-r, l_exists, u_exists)
        dual_feas = jnp.linalg.norm(r + x_bound_duals) / (1.0 + jnp.linalg.norm(self.c))

        converged = bool((gap_upperbound <= tol) & (primal_feas <= tol) & (dual_feas <= tol))
        return gap_upperbound, gap_lower_bound, primal_feas, dual_feas, converged
