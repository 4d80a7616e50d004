"""bench.py canonical-mode plumbing (no TPU): marker detection, env scoping,
and the blackout last-resort path."""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


@pytest.fixture()
def marker_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("DUALIP_BENCH_TILE_CACHE", str(tmp_path))
    return tmp_path


def _write_marker(d, key="abc123", with_entry=True):
    (d / "CANONICAL.json").write_text(json.dumps({
        "num_sources": 25_000_000, "num_dests": 10_000, "sparsity": 1e-3,
        "seed": 42, "cache_key": key,
        "env": {"DUALIP_BENCH_COMPACT": "1", "DUALIP_BENCH_CARRY_DTYPE": "bfloat16"},
    }))
    if with_entry:
        e = d / f"butterfly_{key}"
        e.mkdir()
        (e / "meta.json").write_text("{}")


def test_marker_absent_returns_none(marker_dir):
    assert bench._canonical_marker() is None


def test_marker_with_entry_detected(marker_dir):
    _write_marker(marker_dir)
    info = bench._canonical_marker()
    assert info["num_sources"] == 25_000_000


def test_marker_without_cache_entry_ignored(marker_dir):
    _write_marker(marker_dir, with_entry=False)
    assert bench._canonical_marker() is None  # prime was lost: fall back to probe


def test_marker_corrupt_json_ignored(marker_dir):
    (marker_dir / "CANONICAL.json").write_text("{not json")
    assert bench._canonical_marker() is None


def test_run_canonical_env_scoped_and_fallback(marker_dir, monkeypatch):
    """A failed canonical attempt must restore the probe's env and return
    None (the probe fallback path), stashing nothing but the last resort."""
    import os
    import time

    _write_marker(marker_dir)
    monkeypatch.delenv("DUALIP_BENCH_COMPACT", raising=False)
    calls = []
    monkeypatch.setattr(bench, "_run_child", lambda *a, **k: calls.append(a) or None)
    bench._LAST_RESORT.clear()
    out = bench._run_canonical(bench._canonical_marker(), budget_s=300, t_start=time.perf_counter())
    assert out is None
    assert len(calls) == 1  # small child attempted once, then fallback
    assert "DUALIP_BENCH_COMPACT" not in os.environ  # marker env scoped away
    assert not bench._LAST_RESORT  # no sample landed -> nothing stashed


def test_run_canonical_small_only_stashes_last_resort(marker_dir, monkeypatch):
    import time

    _write_marker(marker_dir)
    small = {"nnz": 249_665_824, "iters": 100, "gen_s": 5.0, "build_s": 30.0,
             "solve_s": 240.0, "dual_objective": -1.0}

    def fake_child(ns, nd, sp, iters, seed, timeout_s=0):
        return small if iters == 100 else None  # big child times out

    monkeypatch.setattr(bench, "_run_child", fake_child)
    bench._LAST_RESORT.clear()
    out = bench._run_canonical(bench._canonical_marker(), budget_s=1200, t_start=time.perf_counter())
    assert out is None  # small-only is not a headline
    # protocol v2 samples up to DUALIP_BENCH_CANON_PAIRS windows; each
    # big-less window stashes its small t/n for the total-blackout fallback
    assert bench._LAST_RESORT
    assert all(s == (2.4, 249_665_824) for s in bench._LAST_RESORT)


def test_min_chunk_rate_excludes_first_chunk():
    r = {"chunk_walls": [[100, 50.0], [100, 20.0], [100, 8.0], [100, 31.0]]}
    assert bench._min_chunk_rate(r) == 8.0 / 100  # chunk 0 (compile+stage) excluded
    assert bench._min_chunk_rate({"chunk_walls": [[100, 50.0]]}) is None
    assert bench._min_chunk_rate({}) is None


def test_run_canonical_min_chunk_wins_and_retry_stops_when_quiet(marker_dir, monkeypatch):
    """Window 0 is contended (slope 2.5 s/iter) but one fetched chunk inside
    the big child was quiet (0.3 s/iter < the 400 ms 'good' bar... no —
    300 ms/iter <= 400 ms/iter): the retry loop must stop after window 0 and
    the min-chunk rate must be the reported estimator."""
    import time

    _write_marker(marker_dir)
    small = {"nnz": 249_665_824, "iters": 100, "gen_s": 5.0, "build_s": 30.0,
             "solve_s": 250.0, "dual_objective": -1.0}
    big = {"nnz": 249_665_824, "iters": 300, "gen_s": 5.0, "build_s": 30.0,
           "solve_s": 750.0, "dual_objective": -1.0,
           "chunk_walls": [[100, 400.0], [100, 30.0], [100, 320.0]]}
    calls = []

    def fake_child(ns, nd, sp, iters, seed, timeout_s=0):
        calls.append(iters)
        return small if iters == 100 else big

    monkeypatch.setattr(bench, "_run_child", fake_child)
    bench._LAST_RESORT.clear()
    out = bench._run_canonical(bench._canonical_marker(), budget_s=10_000, t_start=time.perf_counter())
    assert out is not None
    per_iter, nnz = out
    assert nnz == 249_665_824
    assert per_iter == 30.0 / 100  # min-chunk rate, first chunk excluded
    assert calls.count(100) == 1  # quiet candidate found -> no retry window


def test_run_canonical_retries_windows_when_contended(marker_dir, monkeypatch):
    """All candidates contended: the loop must sample more than one window
    (budget permitting) and report the min across windows."""
    import time

    _write_marker(marker_dir)
    small = {"nnz": 249_665_824, "iters": 100, "gen_s": 5.0, "build_s": 30.0,
             "solve_s": 250.0, "dual_objective": -1.0}
    bigs = iter([
        {"nnz": 249_665_824, "iters": 300, "gen_s": 5.0, "build_s": 30.0,
         "solve_s": 900.0, "dual_objective": -1.0,
         "chunk_walls": [[100, 400.0], [100, 250.0], [100, 250.0]]},
        {"nnz": 249_665_824, "iters": 300, "gen_s": 5.0, "build_s": 30.0,
         "solve_s": 780.0, "dual_objective": -1.0,
         "chunk_walls": [[100, 300.0], [100, 240.0], [100, 240.0]]},
        {"nnz": 249_665_824, "iters": 300, "gen_s": 5.0, "build_s": 30.0,
         "solve_s": 840.0, "dual_objective": -1.0},
    ])

    def fake_child(ns, nd, sp, iters, seed, timeout_s=0):
        return small if iters == 100 else next(bigs)

    monkeypatch.setattr(bench, "_run_child", fake_child)
    out = bench._run_canonical(bench._canonical_marker(), budget_s=100_000, t_start=time.perf_counter())
    assert out is not None
    per_iter, _ = out
    assert per_iter == 240.0 / 100  # best min-chunk across the sampled windows
