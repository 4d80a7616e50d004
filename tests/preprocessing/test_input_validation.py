"""Input validation tests (parity: reference
``tests/preprocessing/test_input_validation.py``)."""

import numpy as np
import pytest

from dualip_tpu.preprocessing import (
    InputValidationError,
    check_correct_csc_construction,
    check_nan_or_inf,
    check_no_zero_row_or_col,
    run_all_checks,
)
from dualip_tpu.sparse import CSCMatrix, csc_from_dense


def test_dense_zero_row():
    arr = np.array([[1.0, 2.0], [0.0, 0.0]])
    with pytest.raises(InputValidationError, match="all-zero row"):
        check_no_zero_row_or_col(arr)


def test_dense_zero_col():
    arr = np.array([[0.0, 2.0], [0.0, 3.0]])
    with pytest.raises(InputValidationError, match="all-zero column"):
        check_no_zero_row_or_col(arr)


def test_csc_zero_row():
    M = csc_from_dense(np.array([[1.0, 2.0], [0.0, 0.0], [3.0, 1.0]]))
    with pytest.raises(InputValidationError, match="all-zero row"):
        check_no_zero_row_or_col(M)


def test_nan_inf():
    with pytest.raises(InputValidationError):
        check_nan_or_inf(np.array([1.0, np.nan]))
    with pytest.raises(InputValidationError):
        check_nan_or_inf(np.array([1.0, np.inf]))
    M = csc_from_dense(np.array([[1.0, -np.inf]]))
    with pytest.raises(InputValidationError):
        check_nan_or_inf(M)


def test_csc_nonmonotone_indptr():
    M = CSCMatrix(
        indptr=np.array([0, 2, 1, 3]),
        row_indices=np.array([0, 1, 0], dtype=np.int32),
        data=np.array([1.0, 2.0, 3.0], dtype=np.float32),
        shape=(2, 3),
    )
    with pytest.raises(InputValidationError, match="non-decreasing"):
        check_correct_csc_construction(M)


def test_csc_unsorted_rows_in_column():
    M = CSCMatrix(
        indptr=np.array([0, 2]),
        row_indices=np.array([1, 0], dtype=np.int32),
        data=np.array([1.0, 2.0], dtype=np.float32),
        shape=(2, 1),
    )
    with pytest.raises(InputValidationError, match="strictly increasing"):
        check_correct_csc_construction(M)


def test_csc_duplicate_rows_in_column():
    M = CSCMatrix(
        indptr=np.array([0, 2]),
        row_indices=np.array([1, 1], dtype=np.int32),
        data=np.array([1.0, 2.0], dtype=np.float32),
        shape=(2, 1),
    )
    with pytest.raises(InputValidationError, match="strictly increasing"):
        check_correct_csc_construction(M)


def test_csc_explicit_zero():
    M = CSCMatrix(
        indptr=np.array([0, 1, 2]),
        row_indices=np.array([0, 1], dtype=np.int32),
        data=np.array([1.0, 0.0], dtype=np.float32),
        shape=(2, 2),
    )
    with pytest.raises(InputValidationError, match="No zeroes"):
        check_correct_csc_construction(M)


def test_run_all_checks_passes_good_input():
    arr = np.array([[1.0, 2.0], [3.0, 4.0]])
    run_all_checks(arr)
    run_all_checks(csc_from_dense(arr))


def test_boundary_pairs_are_not_flagged():
    """Adjacent rows across a column boundary may be non-increasing."""
    M = csc_from_dense(np.array([[0.0, 1.0], [2.0, 0.0]]))  # col0 row1, col1 row0
    check_correct_csc_construction(M)
