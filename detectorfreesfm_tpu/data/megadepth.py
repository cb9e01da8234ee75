"""MegaDepth multiview training tuples + scene-balanced sampling.

Capability match for the reference training data stack
(src/dataset/multiview_match_training_dataset.py:11-142,
src/datamodules/MultiviewMatcherDataModule.py:15-175,
src/dataset/sampler/sampler.py:5-76):

  * per-scene index files hold image/depth paths, intrinsics, w2c poses and
    precomputed image tuples (+ per-view global scales);
  * tuple views are sorted so the reference view comes first
    (`largest_scale` strategy);
  * scenes are sharded across processes (each host loads only its shard —
    reference get_local_split) and sampling is scene-balanced with
    replacement (RandomConcatSampler semantics, n samples per scene per
    epoch);
  * images resize to a square static frame (long side, /8 divisor) with
    intrinsics rescaled accordingly; depths resize to the same grid.

Index file format: one .npz per scene with arrays image_paths, depth_paths
(object/str), K (N, 3, 3), qvec (N, 4), tvec (N, 3), tuples (M, V) int.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from .images import load_gray


@dataclasses.dataclass
class SceneIndex:
    root: str
    image_paths: List[str]
    depth_paths: List[str]
    K: np.ndarray       # (N, 3, 3)
    qvec: np.ndarray    # (N, 4) world->cam
    tvec: np.ndarray    # (N, 3)
    tuples: np.ndarray  # (M, V) image indices; column 0 = reference view


def load_scene_index(path: str, root: Optional[str] = None) -> SceneIndex:
    z = np.load(path, allow_pickle=True)
    return SceneIndex(
        root=root or os.path.dirname(path),
        image_paths=[str(p) for p in z["image_paths"]],
        depth_paths=[str(p) for p in z["depth_paths"]],
        K=np.asarray(z["K"], np.float64),
        qvec=np.asarray(z["qvec"], np.float64),
        tvec=np.asarray(z["tvec"], np.float64),
        tuples=np.asarray(z["tuples"], np.int64),
    )


def shard_scenes(
    scene_paths: Sequence[str], process_index: int, process_count: int,
    seed: int = 66,
) -> List[str]:
    """Deterministic per-process scene shard (reference get_local_split:
    permute, pad to world size, strided split)."""
    rng = np.random.default_rng(seed)
    paths = list(scene_paths)
    perm = rng.permutation(len(paths))
    paths = [paths[i] for i in perm]
    while len(paths) % max(process_count, 1) != 0:
        paths.append(paths[len(paths) % len(paths)])
    return paths[process_index::process_count]


class SceneBalancedSampler:
    """Yields (scene_id, tuple_id) pairs: n_per_scene samples per scene per
    epoch, with replacement, shuffled across scenes."""

    def __init__(self, n_tuples_per_scene: Sequence[int], n_per_scene: int = 250,
                 seed: int = 0):
        self.n_tuples = list(n_tuples_per_scene)
        self.n_per_scene = n_per_scene
        self.seed = seed

    def epoch(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed + epoch)
        out = []
        for s, n in enumerate(self.n_tuples):
            if n == 0:
                continue
            ids = rng.integers(0, n, self.n_per_scene)
            out.append(np.stack([np.full_like(ids, s), ids], -1))
        all_ids = np.concatenate(out) if out else np.zeros((0, 2), np.int64)
        return all_ids[rng.permutation(len(all_ids))]


class MegaDepthTupleDataset:
    """Loads one tuple into the trainer's batch dict format."""

    def __init__(self, scene: SceneIndex, img_size: int = 832, df: int = 8):
        self.scene = scene
        self.img_size = img_size
        self.df = df

    def __len__(self):
        return len(self.scene.tuples)

    def _load_image(self, rel_path: str):
        # Same decode+resize+pad contract as the engines; the native C++
        # loader (GIL-free) keeps multi-worker training staging off the GIL.
        li = load_gray(os.path.join(self.scene.root, rel_path),
                       long_side=self.img_size, df=self.df,
                       pad_to=self.img_size)
        return li.data, (float(li.scale[0]), float(li.scale[1]))

    def _load_depth(self, rel_path: str, scale):
        path = os.path.join(self.scene.root, rel_path)
        if path.endswith(".npy"):
            d = np.load(path)
        elif path.endswith(".npz"):
            d = np.load(path)["depth"]
        else:
            try:
                import h5py

                with h5py.File(path, "r") as f:
                    d = np.asarray(f["depth"])
            except Exception:
                d = np.zeros((2, 2), np.float32)
        h, w = d.shape
        nh = min(self.img_size, int(round(h / scale[1])))
        nw = min(self.img_size, int(round(w / scale[0])))
        # Nearest resize preserves depth validity-zeros
        yi = (np.arange(nh) * (h / nh)).astype(np.int64).clip(0, h - 1)
        xi = (np.arange(nw) * (w / nw)).astype(np.int64).clip(0, w - 1)
        out = np.zeros((self.img_size, self.img_size), np.float32)
        out[:nh, :nw] = d[yi][:, xi]
        return out

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        sc = self.scene
        views = sc.tuples[idx]
        images, depths, Ks, qs, ts = [], [], [], [], []
        for vi in views:
            img, scale = self._load_image(sc.image_paths[vi])
            dep = self._load_depth(sc.depth_paths[vi], scale)
            K = sc.K[vi].copy()
            K[0] /= scale[0]
            K[1] /= scale[1]
            images.append(img[..., None])
            depths.append(dep)
            Ks.append(K)
            qs.append(sc.qvec[vi])
            ts.append(sc.tvec[vi])
        return {
            "images": np.stack(images).astype(np.float32),
            "depths": np.stack(depths).astype(np.float32),
            "K": np.stack(Ks).astype(np.float32),
            "qvec": np.stack(qs).astype(np.float32),
            "tvec": np.stack(ts).astype(np.float32),
        }


def collate(batch: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([b[k] for b in batch]) for k in batch[0]}
