"""detectorfreesfm_tpu — TPU-native detector-free structure-from-motion.

A brand-new JAX/XLA/Pallas framework with the capability surface of
DetectorFreeSfM (CVPR 2024): detector-free coarse transformer matching,
incremental SfM (RANSAC two-view init, PnP registration, multi-view
triangulation), multiview transformer feature-track refinement, and
geometry-aware bundle adjustment — designed TPU-first (static shape buckets,
shard_map over device meshes, Pallas kernels on the hot paths) rather than
translated from the reference's Ray/CUDA/COLMAP stack.

Layering (bottom → top):
  core/      pure-jnp geometry math (SE3, projection, triangulation, epipolar)
  ops/       compute kernels (attention, dual-softmax, roi_align, dsnt, ...)
  models/    Flax model zoo (ResNetFPN, LoFTR coarse matcher, S2DNet,
             multiview refinement matcher)
  match/     pair construction + batched pair-matching engine + keypoint merge
  sfm/       incremental mapper: ransac, pnp, triangulator, track graph, BA
  refine/    track-bag packing + iterative refinement loop
  parallel/  mesh setup + sharding rules (shard_map over pairs / track bags)
  data/      image IO, COLMAP bin/txt model IO, h5 stores
  eval/      pose AUC, point-cloud accuracy/completeness
  train/     supervision warps, losses, trainer
"""

__version__ = "0.1.0"


def reconstruct_scene(*args, **kwargs):
    """Convenience re-export of pipeline.reconstruct_scene (lazy import)."""
    from .pipeline import reconstruct_scene as _f

    return _f(*args, **kwargs)


def build_matcher(*args, **kwargs):
    """Convenience re-export of models.build_matcher (lazy import)."""
    from .models import build_matcher as _f

    return _f(*args, **kwargs)
