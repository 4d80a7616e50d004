"""Beneš butterfly engine: routing exactness, inverse-by-reversal, blocked form."""

import numpy as np
import pytest

import jax.numpy as jnp

from dualip_tpu.ops.butterfly import apply_butterfly, apply_butterfly_tpu, benes_route


@pytest.mark.parametrize("n,seed", [(2, 0), (8, 1), (64, 2), (100, 3), (1024, 4), (5000, 5)])
def test_routing_exact(n, seed):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    plan = benes_route(perm)
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))
    y = np.asarray(apply_butterfly(plan, x))
    np.testing.assert_array_equal(y, np.asarray(x)[perm])


@pytest.mark.parametrize("n,seed", [(64, 0), (1000, 1), (4096, 2)])
def test_reverse_applies_inverse(n, seed):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    plan = benes_route(perm)
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))
    y = apply_butterfly(plan, x)  # y = x[perm]
    back = np.asarray(apply_butterfly(plan, y, reverse=True))
    np.testing.assert_array_equal(back, np.asarray(x))


def test_injective_subselection():
    # n_out < n_in: gather a permuted subset; reverse scatters it back (zeros
    # elsewhere)
    rng = np.random.default_rng(7)
    n_in, n_out = 300, 120
    sel = rng.permutation(n_in)[:n_out]
    plan = benes_route(sel)
    x = jnp.asarray(rng.normal(size=n_in).astype(np.float32))
    y = np.asarray(apply_butterfly(plan, x))
    np.testing.assert_array_equal(y, np.asarray(x)[sel])
    back = np.asarray(apply_butterfly(plan, jnp.asarray(y), reverse=True))
    expect = np.zeros(n_in, np.float32)
    expect[sel] = np.asarray(x)[sel]
    np.testing.assert_array_equal(back, expect)


@pytest.mark.parametrize("n,block_log2", [(4096, 9), (100_000, 12), (1 << 15, 15)])
def test_blocked_tpu_form_matches(n, block_log2):
    # interpret mode on CPU; exercises coarse jnp stages + the Pallas fine
    # kernel, both directions
    rng = np.random.default_rng(11)
    perm = rng.permutation(n)
    plan = benes_route(perm)
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))
    y = np.asarray(
        apply_butterfly_tpu(plan, x, block_log2=block_log2, interpret=True)
    )
    np.testing.assert_array_equal(y, np.asarray(x)[perm])
    back = np.asarray(
        apply_butterfly_tpu(plan, jnp.asarray(y), reverse=True, block_log2=block_log2, interpret=True)
    )
    np.testing.assert_array_equal(back, np.asarray(x))


@pytest.mark.parametrize("n,block_log2", [(4096, 9), (100_000, 12)])
def test_packed_plan_matches(n, block_log2):
    # pre-packed masks (the form the solver ships to device) give identical
    # results to on-the-fly packing, both directions
    from dualip_tpu.ops.butterfly import pack_plan

    rng = np.random.default_rng(13)
    perm = rng.permutation(n)
    plan = benes_route(perm)
    packed = pack_plan(plan, block_log2=block_log2)
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))
    y = np.asarray(apply_butterfly_tpu(packed, x, interpret=True))
    np.testing.assert_array_equal(y, np.asarray(x)[perm])
    back = np.asarray(apply_butterfly_tpu(packed, jnp.asarray(y), reverse=True, interpret=True))
    np.testing.assert_array_equal(back, np.asarray(x))


def test_pad_to_and_errors():
    rng = np.random.default_rng(3)
    perm = rng.permutation(20)
    plan = benes_route(perm, pad_to=64)
    assert plan.masks.shape[1] == 64
    x = jnp.asarray(rng.normal(size=20).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(apply_butterfly(plan, x)), np.asarray(x)[perm])
    with pytest.raises(ValueError):
        benes_route(perm, pad_to=16)
    with pytest.raises(ValueError):
        benes_route(perm, pad_to=48)


def test_random_shape_soak():
    """Randomized shapes (non-pow2 in/out lengths, injective non-surjective
    perms): forward == gather, reverse == scatter-back of the selected
    entries, and the blocked interpret-mode kernel matches the jnp path."""
    from dualip_tpu.ops.butterfly import (
        apply_butterfly,
        apply_butterfly_tpu,
        benes_route,
        pack_plan,
    )

    rng = np.random.default_rng(0)
    for _ in range(6):
        n_out = int(rng.integers(3, 1500))
        n_in = int(rng.integers(n_out, n_out + 800))
        perm = rng.choice(n_in, size=n_out, replace=False)
        plan = benes_route(perm, n_in=n_in)
        x = jnp.asarray(rng.normal(size=n_in).astype(np.float32))
        y = np.asarray(apply_butterfly(plan, x))
        np.testing.assert_array_equal(y, np.asarray(x)[perm])
        back = np.asarray(apply_butterfly(plan, jnp.asarray(y), reverse=True))
        expect = np.zeros(n_in, np.float32)
        expect[perm] = np.asarray(x)[perm]
        np.testing.assert_array_equal(back, expect)
        y2 = np.asarray(apply_butterfly_tpu(pack_plan(plan, block_log2=9), x, interpret=True))
        np.testing.assert_array_equal(y2, y)


@pytest.mark.parametrize("n,block_log2", [(1 << 16, 7), (90_000, 8)])
def test_fused_two_level_coarse_pass(n, block_log2):
    """COARSE_E_CAP < nb ≤ COARSE_FUSE_NB_CAP runs each coarse side as ONE
    fused two-level pass (the (E_hi, E_lo, 128) strip form the canonical
    N=2^29 shape uses at the default block size — forced here with a tiny
    block so CPU interpret mode stays fast)."""
    from dualip_tpu.ops.butterfly import pack_plan

    rng = np.random.default_rng(5)
    perm = rng.permutation(n)
    plan = benes_route(perm)
    packed = pack_plan(plan, block_log2=block_log2)
    # each side must be ONE fused two-level group (nb = N/2^bl > 256)
    assert len(packed.pre_groups) == 1 and len(packed.post_groups) == 1
    for (steps, E, I_rows), m in zip(packed.pre_groups, packed.pre_masks):
        assert isinstance(E, tuple) and E[0] * E[1] > 256
        assert m.shape[0] == (len(steps) + 7) // 8
    x = rng.normal(size=n).astype(np.float32)
    y = np.asarray(apply_butterfly_tpu(packed, jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(y[: plan.n_out], x[perm])
    back = np.asarray(apply_butterfly_tpu(packed, jnp.asarray(y), reverse=True, interpret=True))
    np.testing.assert_array_equal(back[:n], x)


@pytest.mark.parametrize("n,block_log2", [(1 << 16, 7)])
def test_legacy_two_group_split_beyond_fuse_cap(n, block_log2, monkeypatch):
    """nb > COARSE_FUSE_NB_CAP falls back to the two-group-per-side split
    (the N > ~2^30 regime, forced here by shrinking the cap)."""
    import dualip_tpu.ops.butterfly as bf

    monkeypatch.setattr(bf, "COARSE_FUSE_NB_CAP", 64)
    rng = np.random.default_rng(6)
    perm = rng.permutation(n)
    plan = benes_route(perm)
    packed = bf.pack_plan(plan, block_log2=block_log2)
    assert len(packed.pre_groups) == 2 and len(packed.post_groups) == 2
    for (steps, E, I_rows), m in zip(packed.pre_groups, packed.pre_masks):
        assert not isinstance(E, tuple) and E <= 256
    x = rng.normal(size=n).astype(np.float32)
    y = np.asarray(apply_butterfly_tpu(packed, jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(y[: plan.n_out], x[perm])
    back = np.asarray(apply_butterfly_tpu(packed, jnp.asarray(y), reverse=True, interpret=True))
    np.testing.assert_array_equal(back[:n], x)
