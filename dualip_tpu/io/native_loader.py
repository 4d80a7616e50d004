"""ctypes bindings for the native C++ data-plane (``native/dualip_native.cc``).

Builds the shared library on demand with the system toolchain (g++) and caches
it under ``native/build/``.  Every entry point has a pure-numpy fallback, so
the package works without a compiler; the native path exists for extreme-scale
ingestion (O(E) counting-sort CSC assembly, parallel tile filling).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_BUILD_DIR = _NATIVE_DIR / "build"
_SRC = _NATIVE_DIR / "dualip_native.cc"
_SO = _BUILD_DIR / "libdualip_native.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-fPIC",
        "-shared",
        "-std=c++17",
        "-pthread",
        str(_SRC),
        "-o",
        str(_SO),
    ]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        if out.returncode != 0:
            print(f"dualip native build failed:\n{out.stderr[-1000:]}")
            return False
        return True
    except (OSError, subprocess.TimeoutExpired) as e:  # no compiler etc.
        print(f"dualip native build unavailable: {e}")
        return False


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("DUALIP_DISABLE_NATIVE") == "1":
            return None
        # A prebuilt .so without the source alongside (e.g. a packaged
        # deployment) is used as-is; otherwise rebuild when stale.
        if not _SO.exists() or (_SRC.exists() and _SO.stat().st_mtime < _SRC.stat().st_mtime):
            if not _SRC.exists() or not _compile():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError as e:
            print(f"dualip native load failed: {e}")
            return None

        try:
            lib.dualip_gen_create.restype = ctypes.c_void_p
            lib.dualip_gen_create.argtypes = [
                ctypes.c_int64, ctypes.c_int64, ctypes.c_double, ctypes.c_uint64, ctypes.c_int,
            ]
            lib.dualip_gen_nnz.restype = ctypes.c_int64
            lib.dualip_gen_nnz.argtypes = [ctypes.c_void_p]
            lib.dualip_gen_export.restype = None
            lib.dualip_gen_export.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 5
            lib.dualip_gen_free.argtypes = [ctypes.c_void_p]
            lib.dualip_fill_tile.restype = None
            lib.dualip_fill_tile.argtypes = [ctypes.c_void_p] * 4 + [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ] + [ctypes.c_void_p] * 6 + [ctypes.c_int]
            lib.dualip_benes_route.restype = None
            lib.dualip_benes_route.argtypes = [
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
                ctypes.c_int,
            ]
            lib.dualip_benes_route_packed.restype = None
            lib.dualip_benes_route_packed.argtypes = [
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
                ctypes.c_int,
            ]
            lib.dualip_gen_stream_create.restype = ctypes.c_void_p
            lib.dualip_gen_stream_create.argtypes = [
                ctypes.c_int64, ctypes.c_int64, ctypes.c_double, ctypes.c_uint64,
                ctypes.c_int,
            ]
            lib.dualip_gen_stream_count.restype = ctypes.c_int64
            lib.dualip_gen_stream_count.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
            lib.dualip_gen_stream_fill.restype = None
            lib.dualip_gen_stream_fill.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.dualip_gen_stream_free.argtypes = [ctypes.c_void_p]
            if lib.dualip_native_abi_version() != 5:
                return None
        except AttributeError as e:  # incompatible / truncated .so
            print(f"dualip native library rejected: {e}")
            return None
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_native() is not None


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_void_p)


def generate_matching_native(
    num_sources: int,
    num_destinations: int,
    target_sparsity: float,
    seed: int,
    threads: int = 0,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """(indptr, rows, a, c, b) from the native generator, or None.

    Same generative model as the numpy generator; a different (deterministic)
    RNG stream, so values differ from the numpy path at equal seeds.
    """
    lib = load_native()
    if lib is None:
        return None
    h = lib.dualip_gen_create(num_sources, num_destinations, target_sparsity, seed, threads)
    try:
        nnz = lib.dualip_gen_nnz(h)
        indptr = np.empty(num_sources + 1, dtype=np.int64)
        rows = np.empty(nnz, dtype=np.int32)
        a = np.empty(nnz, dtype=np.float64)
        c = np.empty(nnz, dtype=np.float64)
        b = np.empty(num_destinations, dtype=np.float64)
        lib.dualip_gen_export(h, _ptr(indptr), _ptr(rows), _ptr(a), _ptr(c), _ptr(b))
    finally:
        lib.dualip_gen_free(h)
    return indptr, rows, a, c, b


def generate_matching_stream_native(
    num_sources: int,
    num_destinations: int,
    target_sparsity: float,
    seed: int,
    mm_dir,
    dtype=np.float32,
    threads: int = 0,
    batch_edges: int = 1 << 25,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Streaming generation straight into the memmap cache dir: O(num_sources)
    process RSS at any nnz (VERDICT r4 #4 — the buffered native generator
    peaked at ~39 B/nnz, 97 GB at the 2.5B-nnz scaling-grid row).

    Two passes over regenerated per-destination RNG streams: count (fills
    ``ccol``) then fill (scatters rows/a/c into ``open_memmap`` arrays in
    ascending destination order, keeping per-column rows sorted + unique, and
    folding the greedy budget computation into the same sweep).  Values land
    as ``dtype`` (the memmap tier's storage dtype).  Deterministic per seed,
    independent of thread count.  Returns the memmapped (ccol, rows, a, c, b)
    tuple, or None when the native library is unavailable.
    """
    from pathlib import Path

    from numpy.lib.format import open_memmap

    lib = load_native()
    if lib is None or np.dtype(dtype) != np.float32:
        return None
    mm_dir = Path(mm_dir)
    mm_dir.mkdir(parents=True, exist_ok=True)
    h = lib.dualip_gen_stream_create(
        num_sources, num_destinations, target_sparsity, seed, threads
    )
    try:
        ccol = open_memmap(
            mm_dir / "ccol.npy", mode="w+", dtype=np.int64, shape=(num_sources + 1,)
        )
        nnz = lib.dualip_gen_stream_count(h, _ptr(ccol))
        np.cumsum(ccol, out=ccol)
        rows = open_memmap(mm_dir / "rows.npy", mode="w+", dtype=np.int32, shape=(nnz,))
        a = open_memmap(mm_dir / "a.npy", mode="w+", dtype=np.float32, shape=(nnz,))
        c = open_memmap(mm_dir / "c.npy", mode="w+", dtype=np.float32, shape=(nnz,))
        b64 = np.empty(num_destinations, dtype=np.float64)
        lib.dualip_gen_stream_fill(
            h, _ptr(ccol), _ptr(rows), _ptr(a), _ptr(c), _ptr(b64), batch_edges
        )
        for arr in (ccol, rows, a, c):
            arr.flush()
        del ccol, rows, a, c
        np.save(mm_dir / "b.npy", b64.astype(dtype))
    finally:
        lib.dualip_gen_stream_free(h)
    keys = ("ccol", "rows", "a", "c", "b")
    return tuple(np.load(mm_dir / f"{k}.npy", mmap_mode="r") for k in keys)


def fill_tile_native(
    indptr: np.ndarray,
    row_indices: np.ndarray,
    a_data: np.ndarray,
    c_data: np.ndarray,
    cols: np.ndarray,
    K: int,
    L: int,
    keep_flat_idx: bool,
    threads: int = 0,
):
    """Fill (K, L) tile buffers natively; returns None if unavailable.

    Output dtypes match the BlockCSC builder: rows i32, a/c f32, length i32,
    col_ids i32, flat_idx i64 (or None).
    """
    lib = load_native()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    row_indices = np.ascontiguousarray(row_indices, dtype=np.int32)
    a_data = np.ascontiguousarray(a_data, dtype=np.float32)
    c_data = np.ascontiguousarray(c_data, dtype=np.float32)
    cols = np.ascontiguousarray(cols, dtype=np.int64)

    rows_out = np.zeros((K, L), dtype=np.int32)
    a_out = np.zeros((K, L), dtype=np.float32)
    c_out = np.zeros((K, L), dtype=np.float32)
    length = np.zeros(K, dtype=np.int32)
    col_ids = np.full(K, -1, dtype=np.int32)
    flat_idx = np.full((K, L), -1, dtype=np.int64) if keep_flat_idx else None

    lib.dualip_fill_tile(
        _ptr(indptr), _ptr(row_indices), _ptr(a_data), _ptr(c_data),
        _ptr(cols), len(cols), L,
        _ptr(rows_out), _ptr(a_out), _ptr(c_out),
        _ptr(length), _ptr(col_ids),
        _ptr(flat_idx) if flat_idx is not None else None,
        threads,
    )
    return rows_out, a_out, c_out, length, col_ids, flat_idx


def benes_route_native(
    src: np.ndarray, threads: int = 0, block_log2: int = 0
) -> Optional[np.ndarray]:
    """(2n-1, N) int8 Benes stage masks for the completed bijection ``src``
    on N = 2^n slots (src[i] = input slot feeding output slot i), or None.

    Bit-for-bit the same masks as the numpy router's looping-argument
    construction (``dualip_tpu/ops/butterfly.py::benes_route``), computed by
    parallel direct cycle walking instead of pointer doubling: coarse stages
    at full N with K=16 cycle-cut chains, remaining stages block-resident in
    cache (``block_log2`` slots per block; 0 = native default 2^16).
    """
    lib = load_native()
    if lib is None:
        return None
    N = int(src.size)
    n = N.bit_length() - 1
    src = np.ascontiguousarray(src, dtype=np.int32)
    masks = np.empty((2 * n - 1, N), dtype=np.int8)
    lib.dualip_benes_route(N, _ptr(src), _ptr(masks), threads, block_log2)
    return masks


def benes_route_packed_native(
    src: np.ndarray, threads: int = 0, block_log2: int = 0
) -> Optional[np.ndarray]:
    """(ceil((2n-1)/8), N) uint8 stage bit-planes for the completed bijection
    ``src`` — bit-for-bit ``_packbits_stages(benes_route_native(src))`` without
    ever materializing the (2n-1, N) int8 masks (30.6 GB of transient RSS at
    the canonical N=2^29; the planes are 8x smaller and are exactly the
    plan-cache / TPU-kernel currency)."""
    lib = load_native()
    if lib is None:
        return None
    N = int(src.size)
    n = N.bit_length() - 1
    src = np.ascontiguousarray(src, dtype=np.int32)
    planes = np.zeros(((2 * n - 1 + 7) // 8, N), dtype=np.uint8)
    lib.dualip_benes_route_packed(N, _ptr(src), _ptr(planes), threads, block_log2)
    return planes
