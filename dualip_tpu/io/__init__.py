"""IO: MPS reading, native data-plane bindings."""

from dualip_tpu.io.mps import MPSLinearProgram, read_mps_file  # noqa: F401
from dualip_tpu.io.native_loader import (  # noqa: F401
    fill_tile_native,
    generate_matching_native,
    native_available,
)
