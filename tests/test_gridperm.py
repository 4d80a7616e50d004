"""Grid-factored static permutations (Clos/König routing): exactness tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from dualip_tpu.sparse.gridperm import apply_grid_perm, factor_permutation


@pytest.mark.parametrize("n,seed", [(16, 0), (64, 1), (100, 2), (256, 3), (1000, 4), (4096, 5)])
def test_random_permutation_exact(n, seed):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    gp = factor_permutation(perm)
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))
    y = np.asarray(apply_grid_perm(gp, x))
    np.testing.assert_array_equal(y, np.asarray(x)[perm])


def test_identity_and_reverse():
    n = 77
    x = jnp.arange(n, dtype=jnp.float32)
    for perm in (np.arange(n), np.arange(n)[::-1].copy()):
        gp = factor_permutation(perm)
        np.testing.assert_array_equal(np.asarray(apply_grid_perm(gp, x)), np.asarray(x)[perm])


def test_non_square_sizes_and_padding():
    # n_out != n_in: gather with repeated... no — perm must be injective into
    # inputs; test n_out < n_in (select a subset in permuted order)
    rng = np.random.default_rng(9)
    n_in, n_out = 300, 150
    sel = rng.permutation(n_in)[:n_out]
    gp = factor_permutation(sel)
    x = jnp.asarray(rng.normal(size=n_in).astype(np.float32))
    y = np.asarray(apply_grid_perm(gp, x))
    np.testing.assert_array_equal(y, np.asarray(x)[sel])


def test_explicit_grid_size():
    rng = np.random.default_rng(11)
    perm = rng.permutation(50)
    gp = factor_permutation(perm, S=16)
    assert gp.idx1.shape == (16, 16)
    x = jnp.asarray(rng.normal(size=50).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(apply_grid_perm(gp, x)), np.asarray(x)[perm])
    with pytest.raises(ValueError):
        factor_permutation(rng.permutation(50), S=4)  # 16 slots < 50
