"""Cone projection tests (parity: reference ``tests/projections/test_cone.py``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dualip_tpu.projections import project


def test_cone_upper():
    y = project("cone", lower=None, upper=0.5)(jnp.array([-0.2, 0.6, 0.1]))
    assert np.allclose(y, [-0.2, 0.5, 0.1], atol=1e-6)


def test_cone_lower():
    y = project("cone", lower=0, upper=None)(jnp.array([-0.2, 0.6, 0.1]))
    assert np.allclose(y, [0.0, 0.6, 0.1], atol=1e-6)


def test_cone_identity_when_unbounded():
    x = jnp.array([-3.0, 4.0])
    assert np.allclose(project("cone")(x), x)


def test_cone_rejects_both_bounds():
    with pytest.raises(ValueError):
        project("cone", lower=0.0, upper=1.0)


def test_cone_alias_conflict_raises():
    # Regression: cone silently preferred 'l' over 'lower'; now it shares the
    # box resolver's both-given error.
    import pytest

    from dualip_tpu.projections.base import project

    with pytest.raises(ValueError):
        project("cone", lower=5.0, l=0.0)
