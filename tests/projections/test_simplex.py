"""Simplex projection tests (parity: reference ``tests/projections/test_simplex.py``).

Convention change: operators here project along the **last** axis, so the
reference's (L, B) column-matrix cases are transposed to (B, L)."""

import jax.numpy as jnp
import numpy as np

from dualip_tpu.projections import bisection_project, duchi_project, project


def test_module_level_cases():
    # reference test_simplex.py:6-14 (transposed)
    x = jnp.array([[0.5, 0.7], [-0.1, 2.0]], dtype=jnp.float32)
    w_eq = duchi_project(x, z=1.0)
    assert np.allclose(np.sum(w_eq, axis=-1), [1.0, 1.0], atol=1e-5)
    assert (np.asarray(w_eq) >= 0).all()

    w_ineq = duchi_project(x, z=1.0, inequality=True)
    assert (np.sum(w_ineq, axis=-1) <= 1.0 + 1e-5).all()
    assert (np.asarray(w_ineq) >= 0).all()


def test_bfloat16_projection_duchi():
    x_fp32 = jnp.array([[1.0, 3.0, 5.0], [2.0, 4.0, 6.0]], dtype=jnp.float32)
    x_bf16 = x_fp32.astype(jnp.bfloat16)
    r32 = duchi_project(x_fp32, 1.0)
    r16 = duchi_project(x_bf16, 1.0)
    assert np.allclose(np.sum(np.asarray(r32), axis=-1), 1.0, atol=1e-5)
    assert np.allclose(np.sum(np.asarray(r16, dtype=np.float32), axis=-1), 1.0, atol=1e-5)


def test_bfloat16_projection_bisection():
    x_fp32 = jnp.array([[1.0, 3.0, 5.0], [2.0, 4.0, 6.0]], dtype=jnp.float32)
    x_bf16 = x_fp32.astype(jnp.bfloat16)
    r32 = bisection_project(x_fp32, 1.0)
    r16 = bisection_project(x_bf16, 1.0)
    assert np.allclose(np.sum(np.asarray(r32), axis=-1), 1.0, atol=1e-5)
    assert np.allclose(np.sum(np.asarray(r16, dtype=np.float32), axis=-1), 1.0, atol=1e-5)


def test_parity_bisection_duchi_large_values():
    # reference test_simplex.py:129-149: huge magnitudes trigger the vertex shortcut
    x = jnp.array([[100000.0, 100003.0, 100005.0], [100002.0, 100004.0, 100006.0]], dtype=jnp.float32)
    rd = duchi_project(x, 1.0)
    rb = bisection_project(x, 1.0)
    assert np.allclose(np.sum(np.asarray(rd), axis=-1), np.sum(np.asarray(rb), axis=-1), atol=1e-5)


def test_parity_bisection_duchi_mixed_signs():
    # reference test_simplex.py:152-169 (transposed): columns of the original
    x = jnp.array([[-100000.0, 3.0, 500.0], [0.0, 4000000.0, 0.0]], dtype=jnp.float32)
    rd = duchi_project(x, 1.0, inequality=True)
    rb = bisection_project(x, 1.0, inequality=True)
    assert np.allclose(np.sum(np.asarray(rd), axis=-1), 1.0, atol=1e-5)
    assert np.allclose(np.sum(np.asarray(rd), axis=-1), np.sum(np.asarray(rb), axis=-1), atol=1e-5)


def test_simplex_inequality():
    y = project("simplex", z=1.0)(jnp.array([0.1, 0.2, 0.3]))
    assert np.isclose(np.sum(y), 0.6, atol=1e-5)
    assert (np.asarray(y) >= 0).all()


def test_simplex_equality_variants():
    x = jnp.array([1.5, 0.5, 0.5])
    y1 = project("simplex_eq", z=1.0)(x)
    assert np.isclose(np.sum(y1), 1.0, atol=1e-5) and (np.asarray(y1) >= 0).all()
    y2 = project("simplex_eq", z=2.0)(x)
    assert np.isclose(np.sum(y2), 2.0, atol=1e-5) and (np.asarray(y2) >= 0).all()
    y3 = project("simplex_eq", z=2.0)(jnp.array([1.0000005, 0.5, 0.4999999], dtype=jnp.float32))
    assert np.isclose(np.sum(y3), 2.0, atol=1e-5) and (np.asarray(y3) >= 0).all()


def test_simplex_batch_eq():
    # reference test_simplex.py:234-249 (transposed): 3 vectors of length 2
    x = jnp.array([[0.5, -1.0], [1.3, 0.5], [0.4, 0.8]], dtype=jnp.float32)
    y = project("simplex_eq", z=1.0)(x)
    assert np.allclose(np.sum(np.asarray(y), axis=-1), 1.0, atol=1e-5)


def test_simplex_batch_ineq():
    # reference test_simplex.py:252-267 (transposed)
    x = jnp.array([[0.5, 0.5], [0.2, 0.3], [0.4, 0.8]], dtype=jnp.float32)
    y = np.asarray(project("simplex", z=1.0)(x))
    assert np.isclose(y[0].sum(), 1.0, atol=1e-5)
    assert np.isclose(y[1].sum(), 0.5, atol=1e-5)
    assert np.isclose(y[2].sum(), 1.0, atol=1e-5)


def test_duchi_inequality_with_negative_values():
    # reference test_simplex.py:270-284 (transposed)
    x = jnp.array(
        [[-0.0133, 0.0006], [-0.0133, 0.0007], [0.0006, -0.0133], [-0.0133, 0.0006], [-0.0133, 0.0009]],
        dtype=jnp.float32,
    )
    expected = np.array(
        [[0, 0.0006], [0, 0.0007], [0.0006, 0], [0, 0.0006], [0, 0.0009]], dtype=np.float32
    )
    y = duchi_project(x, 1.0, inequality=True)
    assert np.allclose(y, expected, atol=1e-5)


def test_duchi_matches_bruteforce_oracle():
    """Property check vs an exact sort-based numpy oracle over random data."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 9)).astype(np.float32) * 3

    def oracle_eq(v, z):
        # exact Euclidean projection of clamp(v, 0) onto {sum == z, >= 0}
        # (the clamp mirrors the implementation's deliberate pre-clamp,
        # reference simplex.py:148)
        v = np.maximum(v, 0)
        u = np.sort(v)[::-1]
        css = np.cumsum(u)
        rho = np.max(np.nonzero(u - (css - z) / np.arange(1, len(v) + 1) > 0)[0])
        theta = (css[rho] - z) / (rho + 1.0)
        return np.maximum(v - theta, 0)

    got = np.asarray(duchi_project(jnp.asarray(x), 1.0))
    want = np.stack([oracle_eq(r, 1.0) for r in x])
    assert np.allclose(got, want, atol=1e-5)


def test_bisection_matches_duchi_random():
    """Parity on nonnegative inputs.

    The algorithms agree exactly on x >= 0.  On mixed-sign inputs they differ
    *by design inherited from the reference*: Duchi pre-clamps negatives
    before projecting (reference ``simplex.py:148``) while bisection projects
    the raw vector (reference ``simplex.py:84-122``), and their feasibility
    tests differ the same way — so parity is only guaranteed on the
    nonnegative domain (the solver's padded tiles after the clamp)."""
    rng = np.random.default_rng(1)
    for z in (1.0, 2.5):
        x = jnp.asarray(np.abs(rng.normal(size=(32, 7))).astype(np.float32) * 2)
        for ineq in (False, True):
            rd = np.asarray(duchi_project(x, z, inequality=ineq))
            rb = np.asarray(bisection_project(x, z, inequality=ineq))
            assert np.allclose(rd, rb, atol=2e-5), (z, ineq, np.abs(rd - rb).max())


def test_single_element_blocks():
    """L == 1 tiles: eq pins to z, ineq clamps into [0, z]."""
    x = jnp.array([[0.3], [-2.0], [5.0]], dtype=jnp.float32)
    y_eq = np.asarray(duchi_project(x, 1.0))
    assert np.allclose(y_eq, [[1.0], [1.0], [1.0]], atol=1e-6)
    y_ineq = np.asarray(duchi_project(x, 1.0, inequality=True))
    assert np.allclose(y_ineq, [[0.3], [0.0], [1.0]], atol=1e-6)


def test_bisection_matches_duchi_on_negative_inequality():
    # Regression: the inequality fast path must gate on CLAMPED feasibility.
    # The reference's bisection gated on raw x >= 0 (simplex.py:41) and forced
    # [-0.5, 0.3] onto the sum==z facet; the true projection (and Duchi's
    # answer) is the interior point [0, 0.3].
    x = jnp.array([[-0.5, 0.3]], dtype=jnp.float32)
    rb = np.asarray(bisection_project(x, 1.0, inequality=True))
    rd = np.asarray(duchi_project(x, 1.0, inequality=True))
    assert np.allclose(rb, [[0.0, 0.3]], atol=1e-5)
    assert np.allclose(rb, rd, atol=1e-5)


def test_bisection_matches_duchi_preclamp_equality():
    # Regression: both methods pre-clamp to x >= 0 (the golden-traced Duchi
    # semantics); without it bisection returned [0, 1] here instead of
    # Duchi's [0.4, 0.6].
    x = jnp.array([[-5.0, 0.2]], dtype=jnp.float32)
    rb = np.asarray(bisection_project(x, 1.0, inequality=False))
    rd = np.asarray(duchi_project(x, 1.0, inequality=False))
    assert np.allclose(rd, [[0.4, 0.6]], atol=1e-5)
    assert np.allclose(rb, rd, atol=1e-4)


def test_bisection_duchi_random_parity_both_modes():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(64, 9)).astype(np.float32) * 3)
    for ineq in (False, True):
        rb = np.asarray(bisection_project(x, 2.5, inequality=ineq))
        rd = np.asarray(duchi_project(x, 2.5, inequality=ineq))
        assert np.allclose(rb, rd, atol=2e-4), f"inequality={ineq}"
