"""Host-side CSC sparse-matrix container and kernel library.

Parity: reference ``utils/sparse_utils.py`` (450 LoC of torch-CSC ops).  In
the TPU rebuild the *device* hot path never touches flat CSC — it runs on the
BlockCSC tile layout (``dualip_tpu.sparse.bcsc``).  Flat CSC lives only at the
ingestion boundary (file readers, synthetic generators, sharding), so this
module is pure NumPy and fully vectorized (the reference's ``right_multiply``
and ``vstack`` used per-column Python loops, reference
``sparse_utils.py:115-121, 387-406``; ours do not).

Function-name parity with the reference kernel library:
``dot_product_csc``, ``elementwise_csc``, ``left_multiply_sparse``,
``right_multiply_sparse``, ``row_sums_csc``, ``row_norms_csc``,
``split_csc_by_cols``, ``hstack_csc``, ``vstack_csc``
(reference ``sparse_utils.py:7-450``).  ``apply_F_to_columns`` is a device op
and lives in ``dualip_tpu.sparse.bcsc``.
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple, Sequence, Tuple

import numpy as np


class CSCMatrix(NamedTuple):
    """Compressed-sparse-column matrix: ``indptr[(n+1)]``, ``row_indices[nnz]``
    (sorted, unique within each column), ``data[nnz]``, ``shape=(m, n)``."""

    indptr: np.ndarray
    row_indices: np.ndarray
    data: np.ndarray
    shape: Tuple[int, int]

    @property
    def nnz(self) -> int:
        return int(self.data.shape[0])

    @property
    def col_lengths(self) -> np.ndarray:
        return self.indptr[1:] - self.indptr[:-1]


def csc_from_dense(dense: np.ndarray, dtype=np.float32) -> CSCMatrix:
    """Build a CSC matrix from a dense array, dropping exact zeros
    (same convention as ``torch.Tensor.to_sparse_csc``)."""
    dense = np.asarray(dense)
    m, n = dense.shape
    nz_r, nz_c = np.nonzero(dense.T)  # column-major iteration:
    # nz_r is the column index (because of the transpose), nz_c the row.
    counts = np.bincount(nz_r, minlength=n)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return CSCMatrix(
        indptr=indptr,
        row_indices=nz_c.astype(np.int32),
        data=dense.T[nz_r, nz_c].astype(dtype),
        shape=(m, n),
    )


def csc_to_dense(M: CSCMatrix) -> np.ndarray:
    m, n = M.shape
    out = np.zeros((m, n), dtype=M.data.dtype)
    cols = np.repeat(np.arange(n), M.col_lengths)
    out[M.row_indices, cols] = M.data
    return out


def csc_from_arrays(indptr, row_indices, data, shape) -> CSCMatrix:
    return CSCMatrix(
        indptr=np.asarray(indptr, dtype=np.int64),
        row_indices=np.asarray(row_indices, dtype=np.int32),
        data=np.asarray(data),
        shape=(int(shape[0]), int(shape[1])),
    )


def csc_from_scipy(S) -> CSCMatrix:
    S = S.tocsc()
    S.sort_indices()
    return csc_from_arrays(S.indptr, S.indices, S.data, S.shape)


def csc_col_ids(M: CSCMatrix) -> np.ndarray:
    """Column index of every stored nonzero (vectorized; the reference's
    equivalent was a Python loop, reference ``sparse_utils.py:115-121``)."""
    return np.repeat(np.arange(M.shape[1]), M.col_lengths)


def same_pattern(A: CSCMatrix, B: CSCMatrix) -> bool:
    return (
        A.shape == B.shape
        and np.array_equal(A.indptr, B.indptr)
        and np.array_equal(A.row_indices, B.row_indices)
    )


def dot_product_csc(A: CSCMatrix, B: CSCMatrix) -> float:
    """``sum_ij A_ij * B_ij`` for same-pattern matrices (reference
    ``sparse_utils.py:7-23``)."""
    assert A.shape == B.shape, f"Expected equal shapes, got {A.shape} and {B.shape}"
    return float(np.dot(A.data, B.data))


def elementwise_csc(A: CSCMatrix, B: CSCMatrix, op: Callable) -> CSCMatrix:
    """Apply ``op`` elementwise over the shared sparsity pattern (reference
    ``sparse_utils.py:26-51``)."""
    if not same_pattern(A, B):
        raise ValueError("A and B must share the same sparsity pattern")
    return A._replace(data=op(A.data, B.data))


def left_multiply_sparse(v: np.ndarray, M: CSCMatrix) -> CSCMatrix:
    """``diag(v) @ M`` preserving sparsity (reference ``sparse_utils.py:54-85``)."""
    return M._replace(data=M.data * np.asarray(v)[M.row_indices])


def right_multiply_sparse(M: CSCMatrix, v: np.ndarray) -> CSCMatrix:
    """``M @ diag(v)`` preserving sparsity (reference ``sparse_utils.py:88-130``)."""
    return M._replace(data=M.data * np.asarray(v)[csc_col_ids(M)])


def row_sums_csc(A: CSCMatrix) -> np.ndarray:
    """Per-row sums as a dense (m,) vector (reference ``sparse_utils.py:223-243``)."""
    return np.bincount(A.row_indices, weights=A.data, minlength=A.shape[0]).astype(A.data.dtype)


def row_norms_csc(A: CSCMatrix) -> np.ndarray:
    """Per-row L2 norms (reference ``sparse_utils.py:429-450``)."""
    sq = np.bincount(A.row_indices, weights=A.data.astype(np.float64) ** 2, minlength=A.shape[0])
    return np.sqrt(sq).astype(A.data.dtype)


def split_csc_by_cols(M: CSCMatrix, split_sizes: Sequence[int]) -> List[CSCMatrix]:
    """Split into contiguous column blocks (reference ``sparse_utils.py:246-290``)."""
    m, n = M.shape
    if sum(split_sizes) != n:
        raise ValueError(f"split_sizes must sum to {n}")
    blocks, col0 = [], 0
    for width in split_sizes:
        col1 = col0 + width
        s, e = int(M.indptr[col0]), int(M.indptr[col1])
        blocks.append(
            CSCMatrix(
                indptr=(M.indptr[col0 : col1 + 1] - M.indptr[col0]).copy(),
                row_indices=M.row_indices[s:e].copy(),
                data=M.data[s:e].copy(),
                shape=(m, width),
            )
        )
        col0 = col1
    return blocks


def hstack_csc(tensors: Sequence[CSCMatrix]) -> CSCMatrix:
    """Column-wise concatenation (reference ``sparse_utils.py:293-348``)."""
    m = tensors[0].shape[0]
    for i, t in enumerate(tensors):
        if t.shape[0] != m:
            raise ValueError(f"matrix {i} has {t.shape[0]} rows, expected {m}")
    nnz_offsets = np.cumsum([0] + [t.nnz for t in tensors])
    indptr = np.concatenate(
        [tensors[0].indptr] + [t.indptr[1:] + off for t, off in zip(tensors[1:], nnz_offsets[1:])]
    )
    return CSCMatrix(
        indptr=indptr,
        row_indices=np.concatenate([t.row_indices for t in tensors]),
        data=np.concatenate([t.data for t in tensors]),
        shape=(m, sum(t.shape[1] for t in tensors)),
    )


def vstack_csc(tensors: Sequence[CSCMatrix]) -> CSCMatrix:
    """Row-wise stacking (reference ``sparse_utils.py:351-426``; theirs looped
    over columns in Python — ours is a vectorized lexsort merge)."""
    n = tensors[0].shape[1]
    for i, t in enumerate(tensors):
        if t.shape[1] != n:
            raise ValueError(f"matrix {i} has {t.shape[1]} columns, expected {n}")
    row_offsets = np.cumsum([0] + [t.shape[0] for t in tensors])
    all_cols = np.concatenate([csc_col_ids(t) for t in tensors])
    all_rows = np.concatenate([t.row_indices + off for t, off in zip(tensors, row_offsets)])
    all_data = np.concatenate([t.data for t in tensors])
    order = np.lexsort((all_rows, all_cols))
    counts = np.bincount(all_cols, minlength=n)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return CSCMatrix(
        indptr=indptr,
        row_indices=all_rows[order].astype(np.int32),
        data=all_data[order],
        shape=(int(row_offsets[-1]), n),
    )


def csc_matvec(A: CSCMatrix, x: np.ndarray) -> np.ndarray:
    """Dense ``A @ x`` for host-side validation paths."""
    contrib = A.data * np.asarray(x)[csc_col_ids(A)]
    return np.bincount(A.row_indices, weights=contrib, minlength=A.shape[0]).astype(A.data.dtype)


def csc_rmatvec(A: CSCMatrix, y: np.ndarray) -> np.ndarray:
    """Dense ``A.T @ y``."""
    contrib = A.data * np.asarray(y)[A.row_indices]
    return np.bincount(csc_col_ids(A), weights=contrib, minlength=A.shape[1]).astype(A.data.dtype)
