"""Native C++ data-plane tests: builds the library and checks exact
equivalence of the tile filler with the numpy path, plus generator sanity."""

import numpy as np
import pytest

from dualip_tpu.io.native_loader import (
    fill_tile_native,
    generate_matching_native,
    native_available,
)

pytestmark = pytest.mark.skipif(not native_available(), reason="no C++ toolchain")


def test_fill_tile_matches_numpy_builder():
    from dualip_tpu.projections import create_projection_map
    from dualip_tpu.sparse import build_blockcsc, csc_from_dense

    rng = np.random.default_rng(0)
    dense = np.abs(rng.normal(size=(30, 200))).astype(np.float32)
    dense[rng.random(dense.shape) < 0.6] = 0
    dense[0] = np.where(dense[0] == 0, 0.5, dense[0])
    A = csc_from_dense(dense)
    C = csc_from_dense(np.where(dense != 0, -dense, 0).astype(np.float32))

    pm = create_projection_map("simplex", {"z": 1.0}, 200)
    bcsc = build_blockcsc(A, C, pm)  # numpy path (small tiles)

    for tile, spec in zip(bcsc.tiles, bcsc.specs):
        cols = np.asarray(tile.col_ids)
        cols = cols[cols >= 0].astype(np.int64)
        native = fill_tile_native(
            A.indptr, A.row_indices, A.data, C.data, cols, spec.K, spec.L, keep_flat_idx=True
        )
        rows_n, a_n, c_n, len_n, ids_n, flat_n = native
        assert np.array_equal(rows_n, np.asarray(tile.rows))
        assert np.allclose(a_n, np.asarray(tile.a))
        assert np.allclose(c_n, np.asarray(tile.c))
        assert np.array_equal(len_n, np.asarray(tile.length))
        assert np.array_equal(ids_n, np.asarray(tile.col_ids))
        assert np.array_equal(flat_n, spec.flat_idx)


def test_native_generator_produces_valid_lp():
    from dualip_tpu.preprocessing import check_correct_csc_construction
    from dualip_tpu.sparse import csc_from_arrays

    ns, nd = 2000, 100
    out = generate_matching_native(ns, nd, 0.05, seed=11)
    assert out is not None
    indptr, rows, a, c, b = out
    nnz = indptr[-1]
    assert nnz > 0 and len(rows) == nnz
    A = csc_from_arrays(indptr, rows, a.astype(np.float32), (nd, ns))
    check_correct_csc_construction(A._replace(data=np.where(A.data == 0, 1e-9, A.data)))
    # model invariants: a = s_j * c with c in (0, 0.5]; b positive
    assert (c > 0).all() and (c <= 0.5).all()
    assert (a > 0).all()
    assert (b > 0).all()
    # deterministic
    out2 = generate_matching_native(ns, nd, 0.05, seed=11)
    assert np.array_equal(out2[0], indptr) and np.allclose(out2[2], a)
    # different seed differs
    out3 = generate_matching_native(ns, nd, 0.05, seed=12)
    assert not (len(out3[1]) == nnz and np.allclose(out3[2], a))


def test_native_generator_solves():
    """End-to-end: native-generated LP through the solver."""
    import jax.numpy as jnp

    from dualip_tpu.objectives.matching import (
        MatchingInputArgs,
        MatchingSolverDualObjectiveFunction,
    )
    from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
    from dualip_tpu.projections import create_projection_map
    from dualip_tpu.sparse import csc_from_arrays

    ns, nd = 1000, 50
    indptr, rows, a, c, b = generate_matching_native(ns, nd, 0.1, seed=5)
    A = csc_from_arrays(indptr, rows, a.astype(np.float32), (nd, ns))
    C = csc_from_arrays(indptr, rows, (-c).astype(np.float32), (nd, ns))
    args = MatchingInputArgs(
        A=A, c=C, projection_map=create_projection_map("simplex", {"z": 1.0}, ns),
        b_vec=b.astype(np.float32),
    )
    obj = MatchingSolverDualObjectiveFunction(args, gamma=1e-3)
    res = AcceleratedGradientDescent(max_iter=20, gamma=1e-3).maximize(
        obj, jnp.zeros(nd, jnp.float32)
    )
    assert np.isfinite(res.dual_objective)


def test_native_benes_router_matches_numpy():
    """Native cycle-walk router produces bit-identical masks to the numpy
    pointer-doubling router (the construction cited in butterfly.py)."""
    import dualip_tpu.io.native_loader as nl
    import dualip_tpu.ops.butterfly as bf

    if not nl.native_available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    N = 1 << 15  # above the native-dispatch threshold
    perm = rng.permutation(N)
    p_nat = bf.benes_route(perm)
    orig = nl.benes_route_native
    nl.benes_route_native = lambda *a, **k: None  # force the numpy path
    try:
        p_np = bf.benes_route(perm)
    finally:
        nl.benes_route_native = orig
    assert p_nat.dists == p_np.dists
    np.testing.assert_array_equal(np.asarray(p_nat.masks), np.asarray(p_np.masks))


def test_native_packed_router_matches_dense_packbits():
    """The packed-planes router (no (2n-1, N) int8 materialization — the
    30.6 GB RSS peak at canonical scale) emits bit-for-bit
    ``_packbits_stages(dense masks)``, including at a block_log2 that forces
    many coarse stages (the no-atomics |= relies on entry/exit rows of every
    coarse stage living in different planes — see MaskSinkPacked)."""
    import dualip_tpu.io.native_loader as nl
    from dualip_tpu.ops.butterfly import _packbits_stages

    rng = np.random.default_rng(21)
    N = 1 << 15
    src = rng.permutation(N).astype(np.int32)
    for blk in (0, 4, 8, 13):
        dense = nl.benes_route_native(src, block_log2=blk)
        planes = nl.benes_route_packed_native(src, block_log2=blk)
        np.testing.assert_array_equal(planes, _packbits_stages(dense))


def test_native_benes_router_coarse_phase_matches_numpy():
    """The coarse full-N phase (K=16 cycle-cut chains + h^16 jump tables)
    and the coarse→fine handoff produce the same masks as the numpy router.
    The default fine-block size (2^16) exceeds every test-scale N, so this
    forces tiny blocks to push many stages through the coarse path — with a
    partially-used permutation so identity-completed padding (fixed-point
    short-circuit) is exercised too."""
    import dualip_tpu.io.native_loader as nl
    import dualip_tpu.ops.butterfly as bf

    if not nl.native_available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    N = 1 << 14
    for n_out in (N, N // 2 + 123, 1 << 10):
        perm = rng.permutation(N)[:n_out]
        p_np = bf.benes_route(perm, pad_to=N)
        src = np.full(N, -1, dtype=np.int64)
        src[:n_out] = perm
        used = np.zeros(N, dtype=bool)
        used[perm] = True
        tail = np.arange(n_out, N)
        fix = ~used[tail]
        src[tail[fix]] = tail[fix]
        used[tail[fix]] = True
        src[tail[~fix]] = np.nonzero(~used)[0]
        # blk = n-1 pins the boundary where exactly ONE stage is coarse
        # (allocation off-by-one regression: scratch must exist when n > blk)
        for blk in (4, 8, 11, 13):
            masks = nl.benes_route_native(src.astype(np.int32), block_log2=blk)
            np.testing.assert_array_equal(masks, np.asarray(p_np.masks))


def test_stream_generator_matches_buffered_structure(tmp_path):
    """The streaming generator regenerates the SAME per-destination RNG
    streams as the buffered one (edge_seed ^ j*const), so the edge structure
    (ccol, rows) is bit-identical; only the value streams differ (u uses a
    fixed 2^20 chunk so results are thread-count invariant).  Determinism is
    checked across thread counts and batch sizes."""
    from dualip_tpu.io.native_loader import generate_matching_stream_native

    ns, nd, sp = 5000, 200, 0.05
    out = generate_matching_stream_native(ns, nd, sp, seed=7, mm_dir=tmp_path / "m1")
    assert out is not None
    ccol, rows, a, c, b = (np.asarray(x) for x in out)
    nnz = rows.shape[0]

    buf = generate_matching_native(ns, nd, sp, seed=7)
    np.testing.assert_array_equal(ccol, buf[0])
    np.testing.assert_array_equal(rows, buf[1])

    # deterministic across threads / batch granularity
    out2 = generate_matching_stream_native(
        ns, nd, sp, seed=7, mm_dir=tmp_path / "m2", threads=1, batch_edges=997
    )
    for x, y in zip(out, out2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # CSC invariants + model sanity
    assert ccol[0] == 0 and ccol[-1] == nnz and (np.diff(ccol) >= 0).all()
    for i in range(ns):
        assert (np.diff(rows[ccol[i] : ccol[i + 1]]) > 0).all()
    assert (b > 0).all() and (c <= 0.5 + 1e-6).all()
    # a = s_j * c with a shared per-destination factor: ratios constant per row
    sel = c != 0
    ratio = np.zeros_like(a)
    ratio[sel] = a[sel] / c[sel]
    for j in range(nd):
        rj = ratio[sel & (rows == j)] if (sel & (rows == j)).any() else None
        if rj is not None and rj.size:
            np.testing.assert_allclose(rj, rj[0], rtol=1e-5)


def test_stream_generator_end_to_end_backend(tmp_path, monkeypatch):
    """DUALIP_GEN_BACKEND=native-stream writes the memmap tier directly and
    round-trips through generate_synthetic_matching_input_args (warm reload
    stays memmapped and equal)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "benchmark"))
    from generate_synthetic_data import generate_synthetic_matching_input_args

    monkeypatch.setenv("DUALIP_GEN_BACKEND", "native-stream")
    args = generate_synthetic_matching_input_args(
        2000, 100, 0.05, seed=3, cache_dir=str(tmp_path)
    )
    assert args.A.nnz > 0
    args2 = generate_synthetic_matching_input_args(
        2000, 100, 0.05, seed=3, cache_dir=str(tmp_path)
    )
    np.testing.assert_array_equal(np.asarray(args.A.data), np.asarray(args2.A.data))
    np.testing.assert_array_equal(np.asarray(args.b_vec), np.asarray(args2.b_vec))
