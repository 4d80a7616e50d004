"""Sparse kernel library tests vs dense oracles
(parity: reference ``tests/test_sparse_utils.py``)."""

import numpy as np

from dualip_tpu.projections import ProjectionEntry, create_projection_map
from dualip_tpu.sparse import (
    apply_projections,
    build_blockcsc,
    csc_from_dense,
    csc_matvec,
    csc_rmatvec,
    csc_to_dense,
    dot_product_csc,
    elementwise_csc,
    flat_to_tiles_values,
    hstack_csc,
    left_multiply_sparse,
    right_multiply_sparse,
    row_norms_csc,
    row_sums_csc,
    split_csc_by_cols,
    tiles_values_to_flat,
    vstack_csc,
)


def _random_dense(rng, m, n, density=0.4):
    d = rng.normal(size=(m, n)).astype(np.float32)
    mask = rng.random(size=(m, n)) < density
    # Ensure no empty column (BlockCSC requires it; matches solver inputs).
    for j in range(n):
        if not mask[:, j].any():
            mask[rng.integers(m), j] = True
    return np.where(mask, d, 0.0).astype(np.float32)


def test_csc_roundtrip():
    rng = np.random.default_rng(0)
    d = _random_dense(rng, 7, 5)
    M = csc_from_dense(d)
    assert np.allclose(csc_to_dense(M), d)


def test_dot_product_csc():
    rng = np.random.default_rng(1)
    d = _random_dense(rng, 6, 4)
    A = csc_from_dense(d)
    B = A._replace(data=A.data * 2)
    assert np.isclose(dot_product_csc(A, B), np.sum(d * (2 * d)), rtol=1e-6)


def test_elementwise_csc():
    rng = np.random.default_rng(2)
    d = _random_dense(rng, 6, 4)
    A = csc_from_dense(d)
    B = A._replace(data=np.full_like(A.data, 3.0))
    C = elementwise_csc(A, B, np.multiply)
    # dense oracle only on the shared pattern
    assert np.allclose(csc_to_dense(C), d * np.where(d != 0, 3.0, 0.0))


def test_left_multiply_sparse():
    rng = np.random.default_rng(3)
    d = _random_dense(rng, 6, 4)
    v = rng.normal(size=6).astype(np.float32)
    M = left_multiply_sparse(v, csc_from_dense(d))
    assert np.allclose(csc_to_dense(M), np.diag(v) @ d, atol=1e-6)


def test_right_multiply_sparse():
    rng = np.random.default_rng(4)
    d = _random_dense(rng, 6, 4)
    v = rng.normal(size=4).astype(np.float32)
    M = right_multiply_sparse(csc_from_dense(d), v)
    assert np.allclose(csc_to_dense(M), d @ np.diag(v), atol=1e-6)


def test_row_sums_and_norms():
    rng = np.random.default_rng(5)
    d = _random_dense(rng, 8, 5)
    A = csc_from_dense(d)
    assert np.allclose(row_sums_csc(A), d.sum(axis=1), atol=1e-5)
    assert np.allclose(row_norms_csc(A), np.linalg.norm(d, axis=1), atol=1e-5)


def test_split_and_hstack_roundtrip():
    rng = np.random.default_rng(6)
    d = _random_dense(rng, 5, 9)
    A = csc_from_dense(d)
    blocks = split_csc_by_cols(A, [2, 4, 3])
    assert [b.shape for b in blocks] == [(5, 2), (5, 4), (5, 3)]
    assert np.allclose(csc_to_dense(hstack_csc(blocks)), d)


def test_vstack():
    rng = np.random.default_rng(7)
    d1 = _random_dense(rng, 3, 4)
    d2 = _random_dense(rng, 5, 4)
    V = vstack_csc([csc_from_dense(d1), csc_from_dense(d2)])
    assert np.allclose(csc_to_dense(V), np.vstack([d1, d2]))


def test_matvec_oracles():
    rng = np.random.default_rng(8)
    d = _random_dense(rng, 6, 5)
    A = csc_from_dense(d)
    x = rng.normal(size=5).astype(np.float32)
    y = rng.normal(size=6).astype(np.float32)
    assert np.allclose(csc_matvec(A, x), d @ x, atol=1e-5)
    assert np.allclose(csc_rmatvec(A, y), d.T @ y, atol=1e-5)


# ---------------------------------------------------------------------------
# BlockCSC
# ---------------------------------------------------------------------------


def test_blockcsc_roundtrip_and_buckets():
    rng = np.random.default_rng(9)
    d = _random_dense(rng, 16, 12, density=0.35)
    A = csc_from_dense(d)
    C = csc_from_dense(np.where(d != 0, d * 2, 0.0).astype(np.float32))
    pm = create_projection_map("box", {"lower": 0.0, "upper": 1.0}, 12)
    bcsc = build_blockcsc(A, C, pm)

    # every column appears exactly once across tiles
    all_cols = np.concatenate([np.asarray(t.col_ids) for t in bcsc.tiles])
    all_cols = all_cols[all_cols >= 0]
    assert sorted(all_cols.tolist()) == list(range(12))

    # power-of-2 bucket invariant: max length in tile <= L <= bucket threshold
    for tile, spec in zip(bcsc.tiles, bcsc.specs):
        lens = np.asarray(tile.length)
        assert lens.max() == spec.L

    # a/c roundtrip to flat CSC order
    flat_a = tiles_values_to_flat(bcsc, [np.asarray(t.a) for t in bcsc.tiles])
    assert np.allclose(flat_a, A.data)
    flat_c = tiles_values_to_flat(bcsc, [np.asarray(t.c) for t in bcsc.tiles])
    assert np.allclose(flat_c, C.data)

    # flat -> tiles -> flat roundtrip
    vals = rng.normal(size=A.nnz).astype(np.float32)
    tiles_v = flat_to_tiles_values(bcsc, vals)
    assert np.allclose(tiles_values_to_flat(bcsc, tiles_v), vals)


def test_apply_projections_matches_dense_columnwise_oracle():
    """Device analog of the reference apply_F_to_columns oracle test
    (reference tests/test_sparse_utils.py:95-204): projecting bucketed padded
    tiles must equal projecting each column's nnz values zero-padded."""
    import jax.numpy as jnp

    from dualip_tpu.projections import duchi_project

    rng = np.random.default_rng(10)
    d = _random_dense(rng, 12, 10, density=0.5)
    A = csc_from_dense(d)
    C = csc_from_dense(np.where(d != 0, -d, 0.0).astype(np.float32))
    pm = create_projection_map("simplex", {"z": 1.0}, 10)
    bcsc = build_blockcsc(A, C, pm)

    tiles_vals = [jnp.asarray(t.a) for t in bcsc.tiles]
    out = apply_projections(bcsc, tiles_vals)
    got = tiles_values_to_flat(bcsc, [np.asarray(o) for o in out])

    # oracle: per column, zero-pad its nnz values to the tile's L and project
    want = np.zeros_like(A.data)
    for tile, spec in zip(bcsc.tiles, bcsc.specs):
        lens = np.asarray(tile.length)
        for k in range(spec.K):
            if lens[k] == 0:
                continue
            col = int(np.asarray(tile.col_ids)[k])
            s, e = A.indptr[col], A.indptr[col + 1]
            padded = np.zeros(spec.L, dtype=np.float32)
            padded[: lens[k]] = A.data[s:e]
            proj = np.asarray(duchi_project(jnp.asarray(padded[None]), 1.0, inequality=True))[0]
            want[s:e] = proj[: lens[k]]
    assert np.allclose(got, want, atol=1e-5)


def test_blockcsc_multiple_entries_and_identity_fill():
    rng = np.random.default_rng(11)
    d = _random_dense(rng, 8, 6, density=0.6)
    A = csc_from_dense(d)
    C = csc_from_dense(np.where(d != 0, -d, 0.0).astype(np.float32))
    pm = {
        "s": ProjectionEntry("simplex", {"z": 1.0}, indices=[0, 2]),
        "b": ProjectionEntry("box", {"lower": 0.0, "upper": 0.5}, indices=[1, 3]),
    }
    bcsc = build_blockcsc(A, C, pm)  # cols 4, 5 -> identity
    keys = {s.entry_key for s in bcsc.specs}
    assert "__identity__" in keys and "s" in keys and "b" in keys


def test_blockcsc_pad_cols_to():
    rng = np.random.default_rng(12)
    d = _random_dense(rng, 8, 7, density=0.6)
    A = csc_from_dense(d)
    C = csc_from_dense(np.where(d != 0, -d, 0.0).astype(np.float32))
    pm = create_projection_map("box", {}, 7)
    bcsc = build_blockcsc(A, C, pm, pad_cols_to=8)
    for tile in bcsc.tiles:
        assert np.asarray(tile.col_ids).shape[0] % 8 == 0
