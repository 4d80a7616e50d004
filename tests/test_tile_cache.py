"""Device-ready butterfly layout cache: roundtrip identity + true bypass.

VERDICT r2 #5: a warm canonical child spent 290-390 s rebuilding tiles and
the row layout from the generator cache; the cache makes a warm start pure
IO.  These tests pin (a) that a cache hit produces numerically identical
gradients/objectives to a fresh build, and (b) that the hit genuinely skips
the builders (no silent rebuild)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dualip_tpu.objectives.matching import (
    MatchingInputArgs,
    MatchingSolverDualObjectiveFunction,
)
from dualip_tpu.projections import create_projection_map
from dualip_tpu.sparse import csc_from_dense


def _problem(seed=0, m=24, n=512):
    rng = np.random.default_rng(seed)
    dense = (rng.random((m, n)) < 0.25) * rng.random((m, n)).astype(np.float32)
    empty = np.nonzero(dense.sum(axis=0) == 0)[0]
    dense[rng.integers(0, m, size=empty.size), empty] = 0.5
    A = csc_from_dense(dense)
    C = csc_from_dense(np.where(dense != 0, -rng.random((m, n)).astype(np.float32), 0))
    b = rng.random(m).astype(np.float32) * 3
    return MatchingInputArgs(
        A=A, c=C, projection_map=create_projection_map("simplex", {"z": 1.0}, n), b_vec=b
    )


def _build(args, tmp_path, **kw):
    return MatchingSolverDualObjectiveFunction(
        args,
        gamma=1e-3,
        layout="butterfly",
        keep_flat_idx=False,
        keep_col_tiles=False,
        plan_cache_dir=str(tmp_path / "plans"),
        tile_cache_dir=str(tmp_path / "tiles"),
        **kw,
    )


def test_tile_cache_roundtrip_identical(tmp_path):
    args = _problem()
    o1 = _build(args, tmp_path)  # miss: builds + saves (CPU backend)
    assert (tmp_path / "tiles").exists() and any((tmp_path / "tiles").iterdir())
    o2 = _build(args, tmp_path)  # hit

    lam = jnp.asarray(np.abs(np.random.default_rng(3).normal(size=args.A.shape[0])).astype(np.float32))
    r1, r2 = o1.calculate(lam), o2.calculate(lam)
    np.testing.assert_array_equal(np.asarray(r1.dual_gradient), np.asarray(r2.dual_gradient))
    assert float(r1.dual_objective) == float(r2.dual_objective)
    assert float(r1.reg_penalty) == float(r2.reg_penalty)


def test_tile_cache_hit_skips_builders(tmp_path, monkeypatch):
    args = _problem(seed=1)
    _build(args, tmp_path)  # populate

    import dualip_tpu.objectives.matching as mm
    import dualip_tpu.sparse.rowmajor as rm

    def _boom(*a, **k):
        raise AssertionError("builder called despite cache hit")

    monkeypatch.setattr(mm, "build_blockcsc", _boom)
    monkeypatch.setattr(rm, "build_row_layout", _boom)
    o = _build(args, tmp_path)
    assert o.row_layout is not None and len(o.row_layout.col_tiles_T) > 0


def test_tile_cache_key_sensitivity(tmp_path):
    """Different problem data must not hit the same cache entry."""
    a1, a2 = _problem(seed=0), _problem(seed=2)
    from dualip_tpu.io.tile_cache import compute_cache_key

    k1 = compute_cache_key(a1.A, a1.c, a1.projection_map, 128, np.float32, None)
    k2 = compute_cache_key(a2.A, a2.c, a2.projection_map, 128, np.float32, None)
    assert k1 != k2
    # explicit keys shortcut the content hash but still mix in layout options
    k3 = compute_cache_key(a1.A, a1.c, a1.projection_map, 128, np.float32, "wk")
    k4 = compute_cache_key(a1.A, a1.c, a1.projection_map, 256, np.float32, "wk")
    assert k3 != k4


def test_tile_cache_solve_matches_uncached(tmp_path):
    """Full AGD solve through a cache hit equals the uncached butterfly solve."""
    from dualip_tpu.optimizers.agd import AcceleratedGradientDescent

    args = _problem(seed=4)
    m = args.A.shape[0]
    ref = MatchingSolverDualObjectiveFunction(
        args, gamma=1e-3, layout="butterfly", keep_flat_idx=False, keep_col_tiles=False
    )
    _build(args, tmp_path)
    hit = _build(args, tmp_path)
    solver = lambda: AcceleratedGradientDescent(  # noqa: E731
        max_iter=25, gamma=1e-3, initial_step_size=1e-3, max_step_size=1e-1
    )
    r_ref = solver().maximize(ref, jnp.zeros(m, jnp.float32))
    r_hit = solver().maximize(hit, jnp.zeros(m, jnp.float32))
    assert float(r_ref.dual_objective) == float(r_hit.dual_objective)
    np.testing.assert_array_equal(
        np.asarray(r_ref.dual_objective_log), np.asarray(r_hit.dual_objective_log)
    )
