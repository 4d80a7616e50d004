"""LP input validation (parity: reference ``preprocessing/input_validation.py``).

Checks run on host-side inputs (dense numpy arrays or ``CSCMatrix``) before
any device transfer; opt-in by the caller, exactly like the reference (not
wired into ``run_solver``, SURVEY.md §1 L2).
"""

from __future__ import annotations

from typing import Union

import numpy as np

from dualip_tpu.sparse.csc import CSCMatrix


class InputValidationError(ValueError):
    """Raised when any check fails (reference ``input_validation.py:4-5``)."""


def check_no_zero_row_or_col(input_tensor: Union[np.ndarray, CSCMatrix]) -> None:
    """Dense: no all-zero row or column.  CSC: every row has a stored value
    (reference ``input_validation.py:8-31``)."""
    if isinstance(input_tensor, CSCMatrix):
        row_counts = np.bincount(input_tensor.row_indices, minlength=input_tensor.shape[0])
        if (row_counts == 0).any():
            raise InputValidationError("There is an all-zero row in the input tensor")
    else:
        arr = np.asarray(input_tensor)
        if (np.linalg.norm(np.abs(arr), axis=0) == 0).any():
            raise InputValidationError("There is an all-zero column in the input tensor")
        if (np.linalg.norm(np.abs(arr), axis=1) == 0).any():
            raise InputValidationError("There is an all-zero row in the input tensor")


def check_nan_or_inf(input_tensor: Union[np.ndarray, CSCMatrix]) -> None:
    """Reference ``input_validation.py:34-47``."""
    vals = input_tensor.data if isinstance(input_tensor, CSCMatrix) else np.asarray(input_tensor)
    if (~np.isfinite(vals)).any():
        raise InputValidationError("The input tensor has nan or infinite values")


def check_correct_csc_construction(input_tensor: CSCMatrix) -> None:
    """Column pointers monotone; rows strictly increasing per column; no
    explicit zeros (reference ``input_validation.py:50-77``; vectorized)."""
    assert isinstance(input_tensor, CSCMatrix)
    ptr = np.asarray(input_tensor.indptr)
    rows = np.asarray(input_tensor.row_indices)

    if (ptr[:-1] > ptr[1:]).any():
        raise InputValidationError("ccol_indices must be non-decreasing")

    # rows strictly increasing within each column: any adjacent non-increase
    # whose pair lies inside one column is an error.
    if rows.size > 1:
        non_increasing = rows[:-1] >= rows[1:]
        # positions where a new column starts (pair straddles a boundary)
        boundary = np.zeros(rows.size - 1, dtype=bool)
        starts = ptr[1:-1]  # nnz offsets where columns begin (excluding 0 and nnz)
        boundary[starts[(starts > 0) & (starts < rows.size)] - 1] = True
        offenders = non_increasing & ~boundary
        if offenders.any():
            bad_pos = int(np.nonzero(offenders)[0][0]) + 1
            col = int(np.searchsorted(ptr, bad_pos, side="right")) - 1
            raise InputValidationError(f"row indices in column {col} are not strictly increasing")

    if (input_tensor.data == 0).any():
        raise InputValidationError("No zeroes are allowed in CSC values component")


def check_projection_map():
    """Reference ``input_validation.py:80-83`` — unimplemented there as well."""
    raise NotImplementedError("Checking the projection map is not yet implemented")


def run_all_checks(input_tensor: Union[np.ndarray, CSCMatrix]) -> None:
    """Aggregate check (reference ``input_validation.py:86-98``)."""
    if isinstance(input_tensor, CSCMatrix):
        check_correct_csc_construction(input_tensor)
    check_no_zero_row_or_col(input_tensor)
    check_nan_or_inf(input_tensor)
