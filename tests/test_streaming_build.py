"""Streaming host build (dualip_tpu/io/streaming_build.py): the sharded
device-ready cache built one shard at a time from the generator memmap must
warm-start a mesh solve that matches the directly-built solve (identical
math, different shard grouping — fp reassociation tolerance)."""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmark"))

from dualip_tpu.io.streaming_build import stream_build_sharded_cache
from dualip_tpu.objectives.matching import (
    MatchingSolverDualObjectiveFunction,
    matching_tile_cache_key,
)
from dualip_tpu.optimizers.agd import AcceleratedGradientDescent
from dualip_tpu.parallel import default_mesh

pytestmark = pytest.mark.slow  # mesh butterfly solves are multi-10s on CPU


@pytest.fixture()
def gen_memmap(tmp_path, monkeypatch):
    """Small synthetic workload staged through the generator's memmap tier."""
    monkeypatch.setenv("DUALIP_GEN_MEMMAP", "1")
    from generate_synthetic_data import _cache_path, generate_synthetic_matching_input_args

    ns, nd, sp, seed = 3000, 40, 0.05, 11
    backend = os.environ.get("DUALIP_GEN_BACKEND", "numpy")
    args = generate_synthetic_matching_input_args(ns, nd, sp, seed=seed, cache_dir=str(tmp_path))
    mm_dir = _cache_path(str(tmp_path), ns, nd, sp, np.float32, (seed, backend)).with_suffix(".mm")
    assert mm_dir.is_dir(), "generator memmap tier did not engage"
    return args, mm_dir, (nd, ns)


def test_streamed_cache_serves_mesh_solve(gen_memmap, tmp_path):
    args, mm_dir, shape = gen_memmap
    n_shards = 4
    key = matching_tile_cache_key(
        args, n_shards=n_shards, pallas_block_k=128, compact=True, batching=True
    )
    msgs = []
    out = stream_build_sharded_cache(
        mm_dir,
        shape,
        args.projection_map,
        n_shards=n_shards,
        cache_dir=tmp_path / "tiles",
        key=key,
        plan_cache_dir=tmp_path / "plans",
        compact=True,
        pad_cols_to=128,
        progress=msgs.append,
    )
    assert (Path(out) / "meta.json").exists()
    assert any("pass0" in s for s in msgs)

    mesh = default_mesh(n_shards)
    common = dict(
        gamma=1e-3, mesh=mesh, layout="butterfly", pallas_block_k=128,
        compact=True, keep_flat_idx=False, keep_col_tiles=False,
        plan_cache_dir=str(tmp_path / "plans"),
    )
    obj_stream = MatchingSolverDualObjectiveFunction(
        args, tile_cache_dir=str(tmp_path / "tiles"), **common
    )
    # really served from the streamed entry (constructor found the key)
    assert obj_stream.tile_cache_key == key
    assert obj_stream.row_layout.col_tiles_T[0].a.ndim == 4  # stacked leaves

    obj_direct = MatchingSolverDualObjectiveFunction(args, **common)

    lam0 = jnp.zeros(shape[0], jnp.float32)
    solver = lambda: AcceleratedGradientDescent(  # noqa: E731
        max_iter=25, gamma=1e-3, initial_step_size=1e-3, max_step_size=1e-1
    )
    res_s = solver().maximize(obj_stream, lam0)
    res_d = solver().maximize(obj_direct, lam0)
    np.testing.assert_allclose(
        np.asarray(res_s.dual_objective_log),
        np.asarray(res_d.dual_objective_log),
        atol=5e-4,
    )

    # single-device ground truth through the reference-shaped csc pipeline
    obj_csc = MatchingSolverDualObjectiveFunction(args, gamma=1e-3)
    res_c = solver().maximize(obj_csc, lam0)
    np.testing.assert_allclose(
        np.asarray(res_s.dual_objective_log),
        np.asarray(res_c.dual_objective_log),
        atol=5e-4,
    )


def test_streamed_build_is_idempotent(gen_memmap, tmp_path):
    args, mm_dir, shape = gen_memmap
    key = matching_tile_cache_key(
        args, n_shards=2, pallas_block_k=128, compact=True, batching=True
    )
    kw = dict(
        shape=shape, projection_map=args.projection_map, n_shards=2,
        cache_dir=tmp_path / "tiles", key=key,
        plan_cache_dir=tmp_path / "plans", compact=True, pad_cols_to=128,
    )
    p1 = stream_build_sharded_cache(mm_dir, **kw)
    mtime = (Path(p1) / "meta.json").stat().st_mtime_ns
    p2 = stream_build_sharded_cache(mm_dir, **kw)  # key hit: no rebuild
    assert p1 == p2
    assert (Path(p2) / "meta.json").stat().st_mtime_ns == mtime
