"""Incremental structure-from-motion engine (replaces the reference's
COLMAP/Ceres C++ backend — SURVEY.md §2.3).

Host-orchestrated outer loop (image registration order, track bookkeeping)
around jitted fixed-shape JAX kernels: batched RANSAC two-view geometry,
DLT PnP, multi-view DLT triangulation, and a Schur-complement
Levenberg-Marquardt bundle adjuster.
"""

from .reconstruction import Reconstruction  # noqa: F401
from .tracks import build_tracks  # noqa: F401
