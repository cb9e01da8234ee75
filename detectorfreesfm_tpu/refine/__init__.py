"""Iterative multiview refinement: track-bag packing + refine/BA loop
(replaces the reference's post_optimization stage, SURVEY.md §3.4)."""

from .bags import TrackBag, pack_track_bags  # noqa: F401
from .loop import RefineConfig, refine_reconstruction  # noqa: F401
