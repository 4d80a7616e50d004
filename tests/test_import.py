"""Smoke test (parity: reference ``tests/test_import.py``)."""


def test_import():
    import dualip_tpu  # noqa: F401
    import dualip_tpu.objectives  # noqa: F401
    import dualip_tpu.optimizers  # noqa: F401
    import dualip_tpu.parallel  # noqa: F401
    import dualip_tpu.projections  # noqa: F401
    import dualip_tpu.sparse  # noqa: F401

    assert dualip_tpu.__version__
