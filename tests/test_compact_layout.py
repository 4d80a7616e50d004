"""Compact butterfly packing: q columns per pow2 buffer row + geometric row
buckets (``rowmajor._pack_geometry`` / ``bcsc bucketing="exact"``).

At the canonical 250M-nnz shape this takes the carry buffer from 340M slots
(pow2 buckets, N=2^29) to ~1.02x nnz (N=2^28), halving every carry pass and
mask read.  These tests pin numeric parity with the plain paths (same
operands, different summation grouping — fp32 reassociation tolerance) and
the packing geometry invariants."""

import numpy as np
import pytest

import jax.numpy as jnp

from dualip_tpu.objectives.matching import (
    MatchingInputArgs,
    MatchingSolverDualObjectiveFunction,
)
from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
from dualip_tpu.projections import create_projection_map
from dualip_tpu.sparse import csc_from_dense
from dualip_tpu.sparse.rowmajor import _pack_geometry


def test_pack_geometry_invariants():
    for L in range(1, 600):
        L2, q = _pack_geometry(L)
        assert q >= 1 and q * L <= L2
        assert L2 & (L2 - 1) == 0  # pow2 (alignment/bitcast requirement)
        if L <= 128:
            # small columns (the packing's target population) waste ≤ ~1/4;
            # L in (128, 512] can't multi-pack under the 512-lane VMEM cap,
            # so it degrades toward the plain pow2 row (waste < 1/2)
            assert (L2 - q * L) / L2 <= 0.26
    # headline cases
    assert _pack_geometry(1) == (1, 1)  # already zero waste at L2=1
    l2, q = _pack_geometry(34)
    assert q * 34 / l2 > 0.95  # canonical max degree packs tightly


def _problem(seed, m=40, n=700, density=0.15):
    rng = np.random.default_rng(seed)
    dense = (rng.random((m, n)) < density) * rng.random((m, n)).astype(np.float32)
    empty = np.nonzero(dense.sum(axis=0) == 0)[0]
    dense[rng.integers(0, m, size=empty.size), empty] = 0.5
    A = csc_from_dense(dense)
    C = csc_from_dense(np.where(dense != 0, -rng.random((m, n)).astype(np.float32), 0))
    b = rng.random(m).astype(np.float32) * 3
    return MatchingInputArgs(
        A=A, c=C, projection_map=create_projection_map("simplex", {"z": 1.0}, n), b_vec=b
    )


@pytest.mark.parametrize("seed", [0, 7])
def test_compact_per_call_parity_with_csc(seed):
    args = _problem(seed)
    m = args.A.shape[0]
    o_csc = MatchingSolverDualObjectiveFunction(args, gamma=1e-3)
    o_cp = MatchingSolverDualObjectiveFunction(
        args, gamma=1e-3, layout="butterfly", compact=True, keep_flat_idx=False,
        keep_col_tiles=False,
    )
    assert o_cp.row_layout.col_pack is not None
    assert any(q > 1 for (_, _, q) in o_cp.row_layout.col_pack)
    for s in range(3):
        lam = jnp.asarray(
            np.abs(np.random.default_rng(s).normal(size=m)).astype(np.float32)
        )
        r1, r2 = o_csc.calculate(lam), o_cp.calculate(lam)
        g1, g2 = np.asarray(r1.dual_gradient), np.asarray(r2.dual_gradient)
        scale = max(1.0, np.abs(g1).max())
        assert np.allclose(g1, g2, atol=2e-5 * scale), np.abs(g1 - g2).max()
        assert np.isclose(float(r1.dual_objective), float(r2.dual_objective), rtol=1e-5, atol=1e-4)
        assert np.isclose(float(r1.reg_penalty), float(r2.reg_penalty), rtol=1e-5, atol=1e-5)


def test_compact_golden_trace():
    """The 5x5 golden trace holds through the compact layout (tiny problem:
    packing + exact buckets + geometric row buckets all engage trivially)."""
    from tests.objectives.test_dualip_matching_simplex import TRUE_VALUES, set_up_data_scala

    A, C, b_vec = set_up_data_scala()
    pm = create_projection_map("simplex", {"z": 1}, A.shape[1])
    obj = MatchingSolverDualObjectiveFunction(
        MatchingInputArgs(A=A, c=C, projection_map=pm, b_vec=b_vec),
        gamma=1e-3,
        layout="butterfly",
        compact=True,
    )
    res = AcceleratedGradientDescent(max_iter=30, gamma=1e-3).maximize(
        obj, jnp.asarray(0.1 * np.ones(5, np.float32))
    )
    for i, true_val in TRUE_VALUES:
        assert abs(res.dual_objective_log[i - 1] - true_val) < 1e-5


def test_compact_solve_matches_plain_butterfly():
    args = _problem(3, m=24, n=400)
    m = args.A.shape[0]
    mk = lambda **kw: MatchingSolverDualObjectiveFunction(  # noqa: E731
        args, gamma=1e-3, layout="butterfly", keep_flat_idx=False, keep_col_tiles=False, **kw
    )
    solver = lambda: AcceleratedGradientDescent(  # noqa: E731
        max_iter=20, gamma=1e-3, initial_step_size=1e-3, max_step_size=1e-1
    )
    r_plain = solver().maximize(mk(), jnp.zeros(m, jnp.float32))
    r_cp = solver().maximize(mk(compact=True), jnp.zeros(m, jnp.float32))
    assert np.isclose(float(r_plain.dual_objective), float(r_cp.dual_objective), rtol=1e-5, atol=1e-4)


def test_compact_bf16_carry_composes():
    args = _problem(11, m=16, n=300)
    m = args.A.shape[0]
    o32 = MatchingSolverDualObjectiveFunction(
        args, gamma=1e-1, layout="butterfly", compact=True, keep_flat_idx=False,
        keep_col_tiles=False,
    )
    o16 = MatchingSolverDualObjectiveFunction(
        args, gamma=1e-1, layout="butterfly", compact=True, keep_flat_idx=False,
        keep_col_tiles=False, carry_dtype="bfloat16",
    )
    lam = jnp.asarray(np.abs(np.random.default_rng(0).normal(size=m)).astype(np.float32))
    r32, r16 = o32.calculate(lam), o16.calculate(lam)
    g32 = np.asarray(r32.dual_gradient)
    scale = max(1.0, np.abs(g32).max())
    assert np.allclose(g32, np.asarray(r16.dual_gradient), atol=3e-2 * scale)


def test_compact_offset_alignment_with_odd_buffer_rows():
    """Regression (first canonical compact run): BP = ceil(pr/q) can land odd,
    leaving later tiles' region starts off the panel kernel's bp-grid; BP now
    pads to a multiple of 8.  This problem makes a q=25 tile with pr=75
    (BP would be 3) followed by smaller-L2 tiles."""
    rng = np.random.default_rng(13)
    m, n = 30, 9600 + 700
    dense = np.zeros((m, n), dtype=np.float32)
    rows_pick = rng.integers(0, m, size=(9600, 5))
    for j in range(9600):  # 9600 columns of exact degree 5 (pr=75, q=25)
        dense[np.unique(rows_pick[j]) % m, j] = rng.random(np.unique(rows_pick[j]).size)
        while np.count_nonzero(dense[:, j]) < 5:
            dense[rng.integers(0, m), j] = 0.5
    for j in range(9600, n):  # mixed small degrees afterwards
        d = int(rng.integers(1, 4))
        dense[rng.choice(m, size=d, replace=False), j] = rng.random(d)
    A = csc_from_dense(dense)
    C = csc_from_dense(np.where(dense != 0, -rng.random((m, n)).astype(np.float32), 0))
    args = MatchingInputArgs(
        A=A, c=C, projection_map=create_projection_map("simplex", {"z": 1.0}, n),
        b_vec=np.full(m, 2.0, np.float32),
    )
    o_cp = MatchingSolverDualObjectiveFunction(
        args, gamma=1e-3, layout="butterfly", compact=True, keep_flat_idx=False,
        keep_col_tiles=False,
    )
    o_csc = MatchingSolverDualObjectiveFunction(args, gamma=1e-3)
    lam = jnp.asarray(np.abs(np.random.default_rng(2).normal(size=m)).astype(np.float32))
    r1, r2 = o_csc.calculate(lam), o_cp.calculate(lam)
    g1, g2 = np.asarray(r1.dual_gradient), np.asarray(r2.dual_gradient)
    assert np.allclose(g1, g2, atol=2e-5 * max(1.0, np.abs(g1).max()))


def test_compact_rejects_unsupported_modes():
    args = _problem(5, m=8, n=100)
    with pytest.raises(ValueError):
        MatchingSolverDualObjectiveFunction(args, gamma=1e-3, layout="csc", compact=True)
    o = MatchingSolverDualObjectiveFunction(
        args, gamma=1e-3, layout="butterfly", compact=True, keep_flat_idx=False,
        keep_col_tiles=False,
    )
    with pytest.raises(NotImplementedError):
        o.calculate(jnp.zeros(args.A.shape[0], jnp.float32), save_primal=True)


def test_compact_tile_cache_roundtrip(tmp_path):
    args = _problem(9, m=20, n=500)
    m = args.A.shape[0]
    mk = lambda: MatchingSolverDualObjectiveFunction(  # noqa: E731
        args, gamma=1e-3, layout="butterfly", compact=True, keep_flat_idx=False,
        keep_col_tiles=False, plan_cache_dir=str(tmp_path / "plans"),
        tile_cache_dir=str(tmp_path / "tiles"),
    )
    o1 = mk()  # miss: builds + saves
    o2 = mk()  # hit
    assert o2.row_layout.col_pack == o1.row_layout.col_pack
    lam = jnp.asarray(np.abs(np.random.default_rng(1).normal(size=m)).astype(np.float32))
    r1, r2 = o1.calculate(lam), o2.calculate(lam)
    np.testing.assert_array_equal(np.asarray(r1.dual_gradient), np.asarray(r2.dual_gradient))
    assert float(r1.dual_objective) == float(r2.dual_objective)
