"""Sparse containers: host-side flat CSC (ingestion) and device-side BlockCSC
tiles (the hot path).  Parity target: reference ``utils/sparse_utils.py``."""

from dualip_tpu.sparse.csc import (  # noqa: F401
    CSCMatrix,
    csc_col_ids,
    csc_from_arrays,
    csc_from_dense,
    csc_from_scipy,
    csc_matvec,
    csc_rmatvec,
    csc_to_dense,
    dot_product_csc,
    elementwise_csc,
    hstack_csc,
    left_multiply_sparse,
    right_multiply_sparse,
    row_norms_csc,
    row_sums_csc,
    same_pattern,
    split_csc_by_cols,
    vstack_csc,
)
from dualip_tpu.sparse.bcsc import (  # noqa: F401
    BlockCSC,
    Tile,
    TileSpec,
    apply_projections,
    build_blockcsc,
    device_put_blockcsc,
    flat_to_tiles_values,
    tile_valid_mask,
    tiles_values_to_flat,
)
