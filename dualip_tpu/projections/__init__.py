"""Projection operator registry (parity: reference ``projections/__init__.py``).

Importing this package registers all built-in operators: ``box``, ``cone``,
``simplex`` (inequality), ``simplex_eq``, ``box_cut`` (inequality),
``box_cut_eq`` and ``identity``.
"""

from dualip_tpu.projections.base import (  # noqa: F401
    ProjectionEntry,
    ProjectionOperator,
    create_projection_map,
    project,
    register,
    registered_projections,
)

# Explicit imports run the @register side effects (the reference auto-imported
# sibling modules with pkgutil, reference projections/__init__.py:8-16; we
# keep it explicit so the dependency graph is visible to tooling).
from dualip_tpu.projections import box as _box  # noqa: F401,E402
from dualip_tpu.projections import box_cut as _box_cut  # noqa: F401,E402
from dualip_tpu.projections import cone as _cone  # noqa: F401,E402
from dualip_tpu.projections import simplex as _simplex  # noqa: F401,E402

from dualip_tpu.projections.simplex import bisection_project, duchi_project  # noqa: F401

__all__ = [
    "project",
    "ProjectionOperator",
    "create_projection_map",
    "ProjectionEntry",
    "register",
    "registered_projections",
    "duchi_project",
    "bisection_project",
]
