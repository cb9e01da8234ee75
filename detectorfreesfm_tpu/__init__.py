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


def _enable_persistent_compile_cache():
    """Persistent XLA compilation cache (opt-out: DFSFM_NO_COMPILE_CACHE=1).

    Every CLI process pays 20-60 s per jit compile over the TPU tunnel
    (matcher forward, RANSAC buckets, BA Schur steps, refiner crops). The
    shapes are bucketed and recur across scenes AND processes — a disk cache
    turns every process after the first into a warm start. XLA keys the
    cache by platform/HLO/flags, so CPU test runs and TPU runs coexist."""
    import os

    if os.environ.get("DFSFM_NO_COMPILE_CACHE"):
        return
    # CPU-only runs (tests, verify) skip the cache: XLA:CPU AOT reload
    # warns about machine-feature mismatch (potential SIGILL) even on the
    # same host — the win is on the TPU tunnel anyway, where every compile
    # costs 20-60 s of round trips.
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        return
    try:
        import jax

        # Entry points that select CPU via jax.config.update("jax_platforms",
        # "cpu") (bench smoke, diag tools, conftest) must skip the cache too
        # — the env-var check alone misses them (ADVICE r4).
        if "cpu" in str(getattr(jax.config, "jax_platforms", "") or "").lower():
            return

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "dfsfm_xla"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # 2 s floor: TPU-tunnel compiles (the expensive ones) all qualify;
        # the sub-second XLA:CPU executables (template inits, host-side
        # helpers) stay OUT — reloading CPU AOT entries spams
        # machine-feature-mismatch warnings on every run.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        pass


_enable_persistent_compile_cache()


def reconstruct_scene(*args, **kwargs):
    """Convenience re-export of pipeline.reconstruct_scene (lazy import)."""
    from .pipeline import reconstruct_scene as _f

    return _f(*args, **kwargs)


def build_matcher(*args, **kwargs):
    """Convenience re-export of models.build_matcher (lazy import)."""
    from .models import build_matcher as _f

    return _f(*args, **kwargs)
