"""Shared benchmark configuration (parity: reference ``benchmark/config.py``)."""

NUM_SOURCES = 25_000_000
NUM_DESTINATIONS = 10_000
TARGET_SPARSITY = 1e-3
SEED = 42
DTYPE = "float32"

MAX_ITER = 1000
INITIAL_STEP_SIZE = 1e-3
MAX_STEP_SIZE = 1e-1
GAMMA = 1e-3

USE_PRECONDITIONING = False
BATCHING = True  # power-of-2 nnz bucketing of entity tiles
