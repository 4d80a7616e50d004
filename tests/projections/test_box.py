"""Box projection tests (parity: reference ``tests/projections/test_box.py``
plus the schema unification described in SURVEY.md §2.6.4)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from dualip_tpu.projections import project


def test_box():
    y = project("box", lower=0.25, upper=0.3)(jnp.array([0.2, 0.6, 0.1]))
    assert (np.asarray(y) >= 0.25).all()
    assert (np.asarray(y) <= 0.3).all()
    assert np.isclose(np.sum(y), 0.8, atol=1e-6)


def test_box_defaults_unit_interval():
    y = project("box")(jnp.array([-0.5, 0.5, 1.5]))
    assert np.allclose(y, [0.0, 0.5, 1.0])


def test_box_short_aliases():
    """'l'/'u' keys (the reference MIPLIB convention, miplib.py:117-120)."""
    y = project("box", l=0.0, u=3.0)(jnp.array([-1.0, 2.0, 5.0]))
    assert np.allclose(y, [0.0, 2.0, 3.0])


def test_box_nan_bound_is_one_sided():
    """NaN upper == unbounded above (reference test_miplib_objective.py:31)."""
    y = project("box", l=0.0, u=float("nan"))(jnp.array([-1.0, 7.0]))
    assert np.allclose(y, [0.0, 7.0])


def test_box_rejects_mixed_aliases():
    with pytest.raises(ValueError):
        project("box", lower=0.0, l=1.0)
