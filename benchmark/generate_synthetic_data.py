"""Synthetic matching-LP generator (parity: reference
``benchmark/generate_synthetic_data.py``).

Same generative model (reference ``generate_synthetic_data.py:56-164``):
lognormal destination breadth/scale/value, lognormal source affinity,
Poisson per-destination degree, ``c = min(v_j u_i eps, 0.5)``, ``a = s_j c``,
and non-trivial budgets ``b = U(0.5, 1) × greedy per-source best-edge load``.

Vectorization differences (the reference looped in Python over all
destinations and all sources, ``:99-123, 146-157`` — minutes of pure-Python
work at 250M edges, which is why it needed a disk cache):

* edges are drawn in one batch (sources sampled with replacement, then
  (dest, source) pairs deduplicated) — statistically equivalent degree
  distribution, ~1% fewer edges from collision removal;
* the greedy per-source best-edge load is a vectorized segmented argmax.

A .npz disk cache keyed by (sources, destinations, sparsity, dtype, seed)
replaces the reference's memmap+JSON cache (``:169-343``).
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from dualip_tpu.objectives.matching import MatchingInputArgs
from dualip_tpu.projections import create_projection_map
from dualip_tpu.sparse import CSCMatrix, csc_from_arrays

_DEFAULT_CACHE_DIR = os.environ.get("DUALIP_BENCH_CACHE", "./benchmark_data")


def _generate_matching_numpy(
    num_sources: int,
    num_destinations: int,
    target_sparsity: float,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Return (ccol_indices, row_indices, a_values, c_values, b_vec)."""
    if rng is None:
        rng = np.random.default_rng()

    n_src, n_dst = num_sources, num_destinations

    # hyperparameters (reference generate_synthetic_data.py:56-63)
    mu_p, sigma_p = 0.0, 1.0
    mu_s, sigma_s = 0.0, 1.0
    mu_v, sigma_v = -4.0, 0.75
    mu_u, sigma_u = 0.0, 0.5
    sigma_eps = 0.5
    c_max = 0.5

    avg_degree_per_source = target_sparsity * n_dst

    Z = rng.lognormal(mean=mu_p, sigma=sigma_p, size=n_dst)
    z_sum = Z.sum()
    if z_sum == 0:
        Z[:] = 1.0
        z_sum = float(n_dst)
    p = Z / z_sum * avg_degree_per_source

    s = rng.lognormal(mean=mu_s, sigma=sigma_s, size=n_dst)
    v = rng.lognormal(mean=mu_v, sigma=sigma_v, size=n_dst)
    u = rng.lognormal(mean=mu_u, sigma=sigma_u, size=n_src)

    K = np.minimum(rng.poisson(p * n_src), n_src)
    total = int(K.sum())
    if total == 0:
        raise ValueError("No edges generated; increase target_sparsity.")

    dest_ids = np.repeat(np.arange(n_dst, dtype=np.int64), K)
    source_ids = rng.integers(0, n_src, size=total, dtype=np.int64)

    # dedupe (dest, source) pairs
    key = dest_ids * np.int64(n_src) + source_ids
    key = np.unique(key)
    dest_ids = (key // n_src).astype(np.int64)
    source_ids = (key % n_src).astype(np.int64)
    total = key.shape[0]
    del key

    eps_ij = rng.lognormal(mean=0.0, sigma=sigma_eps, size=total)
    c_values = np.minimum(v[dest_ids] * u[source_ids] * eps_ij, c_max)
    a_values = s[dest_ids] * c_values
    del eps_ij

    # CSC layout: sort by source (column), stable so rows stay sorted per col
    order = np.lexsort((dest_ids, source_ids))
    source_sorted = source_ids[order]
    row_indices = dest_ids[order]
    a_sorted = a_values[order]
    c_sorted = c_values[order]
    del order, dest_ids, source_ids, a_values, c_values

    counts = np.bincount(source_sorted, minlength=n_src)
    ccol_indices = np.zeros(n_src + 1, dtype=np.int64)
    np.cumsum(counts, out=ccol_indices[1:])

    # greedy per-source best-edge load (vectorized segmented argmax over columns)
    greedy_loads = np.zeros(n_dst, dtype=np.float64)
    nonempty = counts > 0
    if nonempty.any():
        seg_max = np.maximum.reduceat(a_sorted, ccol_indices[:-1][nonempty])
        # first position in each segment achieving the max
        col_of = np.repeat(np.arange(n_src), counts)
        is_max = a_sorted == seg_max[np.searchsorted(np.flatnonzero(nonempty), col_of)]
        cand = np.flatnonzero(is_max)
        _, first_idx = np.unique(col_of[cand], return_index=True)
        best_pos = cand[first_idx]
        np.add.at(greedy_loads, row_indices[best_pos], a_sorted[best_pos])

    rho = rng.uniform(0.5, 1.0, size=n_dst)
    b_vec = rho * (greedy_loads + 1e-8)

    return ccol_indices, row_indices, a_sorted, c_sorted, b_vec


def _cache_path(cache_dir: str, num_sources, num_destinations, target_sparsity, dtype, seed) -> Path:
    meta = json.dumps(
        {
            "s": num_sources,
            "d": num_destinations,
            "sp": target_sparsity,
            "dt": str(np.dtype(dtype)),
            "seed": seed,
            "v": 1,
        },
        sort_keys=True,
    )
    h = hashlib.sha1(meta.encode()).hexdigest()[:16]
    return Path(cache_dir) / f"matching_{num_sources}x{num_destinations}_{h}.npz"


def generate_synthetic_matching_input_args(
    num_sources: int,
    num_destinations: int,
    target_sparsity: float,
    device: str = "cpu",
    dtype=np.float32,
    seed: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
    cache_dir: Optional[str] = None,
) -> MatchingInputArgs:
    """Public API (reference ``generate_synthetic_data.py:350-471``): returns
    MatchingInputArgs with c negated for minimization and a global
    simplex z=1 projection map.  ``device`` is accepted for parity and
    ignored (placement happens at objective construction)."""
    del device
    cache_dir = cache_dir or _DEFAULT_CACHE_DIR
    use_cache = seed is not None and rng is None
    backend = os.environ.get("DUALIP_GEN_BACKEND", "numpy")
    # Disk-backed staging tier (reference ``generate_synthetic_data.py:202-343``
    # memmapped its cache so >RAM datasets could be assembled): above the
    # threshold the cache is a directory of raw .npy files loaded with
    # mmap_mode="r", so the edge arrays never fully materialize in RAM — the
    # tile builder (native or numpy) reads column slices and the OS pages
    # them in.  Force with DUALIP_GEN_MEMMAP=1/0.
    est_bytes = int(num_sources * num_destinations * target_sparsity) * 24
    mm_env = os.environ.get("DUALIP_GEN_MEMMAP")
    use_memmap = (
        mm_env == "1"
        or (mm_env != "0" and est_bytes > int(os.environ.get("DUALIP_GEN_MEMMAP_THRESHOLD", 4 << 30)))
    )

    arrays = None
    if use_cache:
        path = _cache_path(
            cache_dir, num_sources, num_destinations, target_sparsity, dtype, (seed, backend)
        )
        mm_dir = path.with_suffix(".mm")
        keys = ("ccol", "rows", "a", "c", "b")
        if mm_dir.is_dir() and (mm_dir / "b.npy").exists():
            arrays = tuple(np.load(mm_dir / f"{k}.npy", mmap_mode="r") for k in keys)
        elif path.exists():
            with np.load(path) as data:
                arrays = tuple(data[k] for k in keys)

    if arrays is None and backend == "native-stream" and use_cache and rng is None:
        # Streaming C++ generator: writes the memmap cache tier directly with
        # O(num_sources) process RSS (two regenerated-stream passes; see
        # io/native_loader.generate_matching_stream_native).  Its RNG stream
        # differs from both the numpy and buffered-native backends; the cache
        # key embeds the backend tag, so entries never mix.
        from dualip_tpu.io.native_loader import generate_matching_stream_native

        arrays = generate_matching_stream_native(
            num_sources, num_destinations, target_sparsity, seed=seed or 0,
            mm_dir=mm_dir, dtype=dtype,
        )

    if arrays is None:
        if backend == "native" and rng is None:
            # C++ data-plane: O(E) counting-sort assembly, multithreaded
            # (same generative model, different RNG stream than numpy).
            from dualip_tpu.io.native_loader import generate_matching_native

            out = generate_matching_native(
                num_sources, num_destinations, target_sparsity, seed=seed or 0
            )
            if out is not None:
                arrays = out
        if arrays is None:
            if rng is None and seed is not None:
                rng = np.random.default_rng(seed)
            arrays = _generate_matching_numpy(num_sources, num_destinations, target_sparsity, rng)
        if use_cache:
            ccol, rows, a, c, b = arrays
            if use_memmap:
                mm_dir.mkdir(parents=True, exist_ok=True)
                for k, arr in zip(keys, arrays):
                    # values stored in the requested dtype (the cache key
                    # includes it) so warm loads stay mapped with no astype copy
                    if k in ("a", "c", "b"):
                        arr = np.asarray(arr, dtype=dtype)
                    np.save(mm_dir / f"{k}.npy", arr)
                # reload disk-backed: frees the in-RAM copies for the caller
                arrays = tuple(np.load(mm_dir / f"{k}.npy", mmap_mode="r") for k in keys)
            else:
                path.parent.mkdir(parents=True, exist_ok=True)
                np.savez(path, ccol=ccol, rows=rows, a=a, c=c, b=b)

    ccol, rows, a, c, b = arrays
    shape = (num_destinations, num_sources)
    # keep memmap-backed arrays disk-backed: no astype copy when dtypes match
    a_d = a if a.dtype == np.dtype(dtype) else a.astype(dtype)
    A = csc_from_arrays(ccol, rows, a_d, shape)
    C = csc_from_arrays(ccol, rows, (-c).astype(dtype), shape)

    projection_map = create_projection_map("simplex", {"z": 1.0}, num_sources)
    return MatchingInputArgs(
        A=A, c=C, projection_map=projection_map, b_vec=b.astype(dtype), equality_mask=None
    )
