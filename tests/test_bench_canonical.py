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
    assert bench._LAST_RESORT == [(2.4, 249_665_824)]  # stashed for total blackout
