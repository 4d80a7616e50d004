"""Jacobi preconditioning tests (parity: reference
``tests/preprocessing/test_precondition.py``)."""

import numpy as np

from dualip_tpu.preprocessing import jacobi_invert_precondition, jacobi_precondition
from dualip_tpu.sparse import csc_from_dense, csc_to_dense


def test_jacobi_precondition_scales_rows_to_unit_norm(tmp_path):
    rng = np.random.default_rng(0)
    dense = rng.normal(size=(4, 6)).astype(np.float32)
    dense[np.abs(dense) < 0.3] = 0.0
    dense[:, 0] = np.where(dense[:, 0] == 0, 0.5, dense[:, 0])
    for i in range(4):
        if (dense[i] == 0).all():
            dense[i, 0] = 1.0
    A = csc_from_dense(dense)
    b = rng.normal(size=4).astype(np.float32)

    norms_path = str(tmp_path / "norms")
    A2, b2, norms = jacobi_precondition(A, b, norms_save_path=norms_path)

    expected_norms = np.linalg.norm(dense, axis=1)
    assert np.allclose(norms, expected_norms, atol=1e-5)
    assert np.allclose(csc_to_dense(A2), dense / expected_norms[:, None], atol=1e-5)
    assert np.allclose(b2, b / expected_norms, atol=1e-5)

    # inversion from saved norms and from the tensor directly
    dual = rng.normal(size=4).astype(np.float32)
    inv_from_file = jacobi_invert_precondition(dual, norms_path)
    inv_from_tensor = jacobi_invert_precondition(dual, norms)
    assert np.allclose(inv_from_file, dual / expected_norms, atol=1e-5)
    assert np.allclose(inv_from_tensor, inv_from_file)


def test_jacobi_zero_row_guard():
    dense = np.array([[1.0, 2.0], [0.0, 0.0]], dtype=np.float32)
    A = csc_from_dense(dense)
    b = np.array([1.0, 1.0], dtype=np.float32)
    A2, b2, norms = jacobi_precondition(A, b)
    # zero row: norm recorded as 0 but scaling treated it as 1
    assert norms[1] == 0.0
    assert np.allclose(b2, [1.0 / np.sqrt(5.0), 1.0], atol=1e-6)
