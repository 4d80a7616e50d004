"""Coverage for checkpointing, MLflow gating, dist utils, profiling, and the
driver entry points."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- checkpoint
def test_checkpoint_roundtrip_with_state(tmp_path):
    from dualip_tpu.checkpoint import load_dual, save_dual
    from dualip_tpu.optimizers.agd_utils import StepSizeState

    state = StepSizeState(
        grad_hist=jnp.arange(30.0).reshape(15, 2),
        dual_hist=jnp.arange(30.0).reshape(15, 2) * 2,
        count=jnp.asarray(7, jnp.int32),
    )
    path = str(tmp_path / "ckpt.npz")
    save_dual(path, jnp.array([1.0, 2.0]), state)
    dual, loaded = load_dual(path)
    assert np.allclose(dual, [1.0, 2.0])
    assert int(loaded.count) == 7
    assert np.allclose(loaded.grad_hist, state.grad_hist)


# ------------------------------------------------------------------- mlflow
def test_mlflow_noop_when_disabled():
    from dualip_tpu.utils.mlflow_utils import (
        MLflowConfig,
        log_hyperparameters,
        log_metrics,
        log_objective_result,
        mlflow_run_context,
    )
    from dualip_tpu.types import ObjectiveResult

    with mlflow_run_context(MLflowConfig(enabled=False)) as run:
        assert run is None
        log_hyperparameters({"solver": {"max_iter": 10}})
        log_metrics({"dual_objective": 1.0}, step=1)
        log_objective_result(
            ObjectiveResult(dual_gradient=jnp.zeros(2), dual_objective=jnp.asarray(1.0)), step=1
        )  # all silently no-op


def test_mlflow_solve_with_config_enabled_but_unavailable():
    """enabled=True with mlflow missing must not crash the solve."""
    from dualip_tpu import ComputeArgs, ObjectiveArgs, SolverArgs, run_solver
    from dualip_tpu.objectives.matching import MatchingInputArgs
    from dualip_tpu.projections import create_projection_map
    from dualip_tpu.sparse import csc_from_dense
    from dualip_tpu.utils.mlflow_utils import MLflowConfig, is_mlflow_available

    a = np.array([[0.3, 0.5], [0.2, 0.8]], dtype=np.float32)
    args = MatchingInputArgs(
        A=csc_from_dense(a),
        c=csc_from_dense(-a),
        projection_map=create_projection_map("simplex", {"z": 1}, 2),
        b_vec=np.array([0.7, 0.7], np.float32),
    )
    res = run_solver(
        input_args=args,
        solver_args=SolverArgs(max_iter=3, gamma=1e-3),
        compute_args=ComputeArgs(host_device="cpu"),
        objective_args=ObjectiveArgs(objective_type="matching"),
        mlflow_config=MLflowConfig(enabled=True),
    )
    assert np.isfinite(res.dual_objective)
    assert not is_mlflow_available() or True  # either way the solve survived


# ---------------------------------------------------------------- dist utils
def test_split_tensors_and_projection_remap():
    from dualip_tpu.parallel import global_to_local_projection_map, split_tensors_to_devices
    from dualip_tpu.projections import ProjectionEntry
    from dualip_tpu.sparse import csc_from_dense, csc_to_dense

    rng = np.random.default_rng(0)
    dense = rng.normal(size=(4, 10)).astype(np.float32)
    dense[dense == 0] = 0.1
    A = csc_from_dense(dense)
    C = csc_from_dense((dense * 2).astype(np.float32))

    a_sp, c_sp, index_map = split_tensors_to_devices(A, C, ["d0", "d1", "d2"])
    assert [s.shape[1] for s in a_sp] == [4, 3, 3]
    assert index_map[0] == [0, 1, 2, 3] and index_map[2] == [7, 8, 9]
    assert np.allclose(
        np.concatenate([csc_to_dense(s) for s in a_sp], axis=1), dense
    )

    gm = {
        "s": ProjectionEntry("simplex", {"z": 1.0}, indices=[0, 5, 9]),
        "b": ProjectionEntry("box", {}, indices=[4]),
    }
    lm = global_to_local_projection_map(gm, index_map[1])  # cols 4, 5, 6
    assert lm["s"].indices == [1]  # global 5 -> local 1
    assert lm["b"].indices == [0]  # global 4 -> local 0
    assert "s" in lm and lm["s"].proj_type == "simplex"


def test_process_shard_bounds():
    from dualip_tpu.parallel import process_shard_bounds

    bounds = [process_shard_bounds(10, pi, 3) for pi in range(3)]
    assert bounds == [(0, 4), (4, 7), (7, 10)]
    # full coverage, no overlap
    assert bounds[0][1] == bounds[1][0] and bounds[1][1] == bounds[2][0]


def test_local_matching_shard_roundtrip():
    from dualip_tpu.objectives.matching import MatchingInputArgs
    from dualip_tpu.parallel import local_matching_shard
    from dualip_tpu.projections import create_projection_map
    from dualip_tpu.sparse import csc_from_dense, csc_to_dense

    rng = np.random.default_rng(1)
    dense = np.abs(rng.normal(size=(3, 9))).astype(np.float32)
    args = MatchingInputArgs(
        A=csc_from_dense(dense),
        c=csc_from_dense(-dense),
        projection_map=create_projection_map("simplex", {"z": 1}, 9),
        b_vec=np.ones(3, np.float32),
    )
    shards = [local_matching_shard(args, pi, 3) for pi in range(3)]
    rebuilt = np.concatenate([csc_to_dense(s.A) for s in shards], axis=1)
    assert np.allclose(rebuilt, dense)
    assert all(np.allclose(s.b_vec, args.b_vec) for s in shards)
    assert shards[1].projection_map  # remapped, non-empty


# --------------------------------------------------------------- profiling
def test_phase_timer():
    from dualip_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert "a" in t.phases and t.phases["a"] >= 0
    assert "a=" in t.report()


# ------------------------------------------------------------- graft entry
def test_graft_entry_single_device():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    grad, obj = out
    assert np.asarray(grad).shape == (16,)
    assert np.isfinite(np.asarray(obj))


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    n = min(8, len(jax.devices()))
    if n < 2:
        pytest.skip("needs multiple devices")
    g.dryrun_multichip(n)


# ------------------------------------------------------- validation misc
def test_check_projection_map():
    # Implemented here (the reference left it NotImplementedError,
    # input_validation.py:80-83).
    import numpy as np

    from dualip_tpu.preprocessing import InputValidationError, check_projection_map
    from dualip_tpu.projections.base import ProjectionEntry

    ok = {
        "box": ProjectionEntry("box", {"lower": 0.0, "upper": 1.0}, [0, 1]),
        "simplex": ProjectionEntry("simplex", {"z": 1.0}, [2, 3]),
        "cone": ProjectionEntry("cone", {"lower": 0.0, "upper": float("nan")}, [4]),
    }
    check_projection_map(ok, num_cols=5)  # no raise

    bad_cases = [
        {},  # empty
        {"x": "not an entry"},
        {"x": ProjectionEntry("nope", {}, [0])},  # unregistered type
        {"x": ProjectionEntry("box", {"lower": 2.0, "upper": 1.0}, [0])},  # lo > hi
        {"x": ProjectionEntry("cone", {"lower": 0.0, "upper": 1.0}, [0])},  # two bounds
        {"x": ProjectionEntry("simplex", {"z": -1.0}, [0])},  # bad z
        {"x": ProjectionEntry("simplex", {"z": 1.0, "method": "qp"}, [0])},  # bad method
        {"x": ProjectionEntry("box", {}, [])},  # no indices
        {"x": ProjectionEntry("box", {}, [-1])},  # negative index
        {"x": ProjectionEntry("box", {}, [0, 0])},  # dup within entry
        {  # dup across entries
            "a": ProjectionEntry("box", {}, [0, 1]),
            "b": ProjectionEntry("simplex", {"z": 1.0}, [1, 2]),
        },
    ]
    for bad in bad_cases:
        with pytest.raises(InputValidationError):
            check_projection_map(bad, num_cols=5)
    with pytest.raises(InputValidationError):  # out of bounds
        check_projection_map({"x": ProjectionEntry("box", {}, [7])}, num_cols=5)
    np_idx = {"x": ProjectionEntry("box", {}, np.array([0, 1]))}
    check_projection_map(np_idx)  # array indices, no num_cols


def test_collect_stats_populates_last_run_stats():
    from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
    from dualip_tpu.types import ObjectiveResult

    class Obj:
        equality_mask = None

        def calculate(self, dual_val, save_primal=False, **kw):
            return ObjectiveResult(dual_gradient=-dual_val, dual_objective=-jnp.sum(dual_val**2))

    solver = AcceleratedGradientDescent(max_iter=8, gamma=None)
    solver.collect_stats = True
    solver.maximize(Obj(), jnp.ones(3, jnp.float32))
    stats = solver.last_run_stats
    assert stats is not None and stats["iters"] == 8
    assert stats["total_s"] > 0 and stats["drain_s"] >= 0
