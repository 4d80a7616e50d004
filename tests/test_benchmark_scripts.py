"""Smoke tests for the benchmark suite on tiny CPU workloads."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def test_synthetic_generator_properties():
    sys.path.insert(0, str(REPO / "benchmark"))
    from generate_synthetic_data import generate_synthetic_matching_input_args

    args = generate_synthetic_matching_input_args(500, 50, 0.05, seed=7)
    A, C = args.A, args.c
    assert A.shape == (50, 500)
    assert A.nnz > 0
    # same pattern, c negated (minimization), a = s_j * |c| > 0
    assert np.array_equal(A.indptr, C.indptr)
    assert (C.data <= 0).all()
    assert (A.data > 0).all()
    # budgets nontrivial: positive, not all huge
    b = np.asarray(args.b_vec)
    assert (b >= 0).all() and b.max() > 0
    # deterministic under seed + cached
    args2 = generate_synthetic_matching_input_args(500, 50, 0.05, seed=7)
    assert np.allclose(args2.A.data, A.data)


def test_generator_cache(tmp_path):
    sys.path.insert(0, str(REPO / "benchmark"))
    from generate_synthetic_data import generate_synthetic_matching_input_args

    a1 = generate_synthetic_matching_input_args(200, 20, 0.1, seed=3, cache_dir=str(tmp_path))
    assert list(tmp_path.glob("*.npz"))
    a2 = generate_synthetic_matching_input_args(200, 20, 0.1, seed=3, cache_dir=str(tmp_path))
    assert np.allclose(a1.A.data, a2.A.data)


def test_generator_memmap_tier(tmp_path, monkeypatch):
    """DUALIP_GEN_MEMMAP=1: the cache becomes a directory of raw .npy files
    loaded disk-backed (mmap_mode='r') — the >RAM staging tier (reference
    generate_synthetic_data.py:202-343 memmapped its cache for the same
    reason).  Numerics identical to the in-RAM npz tier."""
    sys.path.insert(0, str(REPO / "benchmark"))
    from generate_synthetic_data import generate_synthetic_matching_input_args

    a_npz = generate_synthetic_matching_input_args(200, 20, 0.1, seed=3, cache_dir=str(tmp_path / "z"))
    monkeypatch.setenv("DUALIP_GEN_MEMMAP", "1")
    a_mm = generate_synthetic_matching_input_args(200, 20, 0.1, seed=3, cache_dir=str(tmp_path / "m"))
    mm_dirs = list((tmp_path / "m").glob("*.mm"))
    assert mm_dirs and (mm_dirs[0] / "a.npy").exists()
    # stays disk-backed end to end (asarray wraps the memmap without copying)
    base = a_mm.A.data
    while base is not None and not isinstance(base, np.memmap):
        base = base.base
    assert isinstance(base, np.memmap)
    # warm reload takes the memmap branch
    a_mm2 = generate_synthetic_matching_input_args(200, 20, 0.1, seed=3, cache_dir=str(tmp_path / "m"))
    for x, y in ((a_npz, a_mm), (a_mm, a_mm2)):
        assert np.array_equal(np.asarray(x.A.data), np.asarray(y.A.data))
        assert np.array_equal(np.asarray(x.c.data), np.asarray(y.c.data))
        assert np.array_equal(np.asarray(x.b_vec), np.asarray(y.b_vec))


def _run(script, *args, timeout=600):
    out = subprocess.run(
        [sys.executable, str(script), *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=str(REPO),
    )
    assert out.returncode == 0, f"{script} failed:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}"
    return out.stdout


def test_run_matching_benchmark_tiny(tmp_path):
    out = _run(
        REPO / "benchmark" / "run_matching_benchmark.py",
        "--num-sources", "500", "--num-destinations", "50",
        "--target-sparsity", "0.05", "--max-iter", "10",
        "--platform", "cpu", "--out-dir", str(tmp_path),
    )
    assert "ms/iter" in out
    assert list(tmp_path.glob("dual_curve*.csv")) and list(tmp_path.glob("metrics*.json"))


def test_run_matching_benchmark_sharded_tiny():
    out = _run(
        REPO / "benchmark" / "run_matching_benchmark_sharded.py",
        "--num-sources", "500", "--num-destinations", "50",
        "--target-sparsity", "0.05", "--max-iter", "10",
        "--platform", "cpu", "--num-devices", "4",
    )
    assert "ms/iter" in out


def test_scaling_benchmark_tiny(tmp_path):
    csv_path = tmp_path / "scaling.csv"
    out = _run(
        REPO / "benchmark" / "run_scaling_benchmark.py",
        "--source-sizes", "300,600",
        "--device-counts", "1,2",
        "--num-destinations", "30", "--target-sparsity", "0.1",
        "--max-iter", "10", "--platform", "cpu",
        "--out-csv", str(csv_path),
    )
    assert csv_path.exists()
    lines = csv_path.read_text().strip().splitlines()
    assert len(lines) == 5  # header + 2 sizes x 2 device counts
    assert "OK" in out  # cross-device agreement check passed


def test_bench_child_mode():
    """bench.py child mode produces a parseable JSON result."""
    import os

    env = dict(os.environ)
    env["DUALIP_BENCH_CHILD"] = json.dumps({"s": 500, "d": 50, "sp": 0.05, "it": 5, "seed": 1})
    env["DUALIP_BENCH_PLATFORM"] = "cpu"
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(REPO),
    )
    # sitecustomize may force TPU; child still must print valid JSON on success
    assert out.returncode == 0, out.stderr[-1500:]
    line = [l for l in out.stdout.splitlines() if l.strip().startswith("{")][0]
    data = json.loads(line)
    assert data["iters"] == 5 and np.isfinite(data["dual_objective"])


def test_bench_main_mode():
    """bench.py top-level protocol (adaptive pairs, min-estimator) end to end."""
    import os

    env = dict(os.environ)
    env.update(
        DUALIP_BENCH_PLATFORM="cpu",
        DUALIP_BENCH_SOURCES="500",
        DUALIP_BENCH_DESTS="50",
        DUALIP_BENCH_SPARSITY="0.05",
        DUALIP_BENCH_ITERS_SMALL="5",
        DUALIP_BENCH_ITERS_BIG="40",
        DUALIP_BENCH_REPEATS="1",
        DUALIP_BENCH_BUDGET_S="500",
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-1500:]
    line = [l for l in out.stdout.splitlines() if l.strip().startswith("{")][-1]
    data = json.loads(line)
    assert data["metric"] == "matching_iters_per_sec"
    assert data["unit"] == "iter/s"
    assert data["value"] > 0


def test_streamed_gen_build_staged_solve_chain(tmp_path):
    """native-stream generation → sharded streaming build → staged mesh solve,
    chained through the real driver scripts (results redirected to tmp)."""
    import json

    import dualip_tpu.io.native_loader as nl

    if not nl.native_available():
        import pytest

        pytest.skip("native library unavailable")
    env = dict(os.environ)
    env["DUALIP_GEN_BACKEND"] = "native-stream"
    env["DUALIP_STREAMBUILD_RESULTS"] = str(tmp_path / "results.json")
    common = [
        "--sources", "20000", "--dests", "100", "--sparsity", "0.05",
        "--shards", "4", "--cache-dir", str(tmp_path / "bd"),
    ]
    for script, extra in (
        ("run_streaming_build.py", []),
        ("run_staged_mesh_solve.py", ["--iters", "5"]),
    ):
        out = subprocess.run(
            [sys.executable, str(REPO / "benchmark" / script), *common, *extra],
            capture_output=True, text=True, timeout=600, cwd=str(REPO), env=env,
        )
        assert out.returncode == 0, f"{script}:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}"
    entries = json.loads((tmp_path / "results.json").read_text())
    phases = [e["phase"] for e in entries]
    assert phases == ["gen", "build", "staged_mesh_solve"]
    assert entries[0]["backend"] == "native-stream"
    solve = entries[-1]
    assert solve["finite"] and solve["dual_improved"]
