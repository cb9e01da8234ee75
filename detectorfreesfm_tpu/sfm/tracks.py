"""Feature-track graph: union-find over match endpoints.

The host-side equivalent of COLMAP's correspondence graph / track builder
(the reference never sees this code — it lives inside the COLMAP fork's
mapper; behavior contract per SURVEY.md §2.3). Deterministic, vectorized
numpy union-find: endpoints are (image, keypoint) nodes, verified matches are
edges, connected components become candidate tracks. Components containing
two different keypoints of the *same* image are inconsistent and get that
image's observations dropped (COLMAP discards conflicting correspondences).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_native_lib: Optional[ctypes.CDLL] = None
_native_tried = False


def _load_native() -> Optional[ctypes.CDLL]:
    """Load (building on demand) the C++ union-find; None -> Python path."""
    global _native_lib, _native_tried
    if _native_tried:
        return _native_lib
    _native_tried = True
    so = os.path.join(_NATIVE_DIR, "libtrackbuilder.so")
    src = os.path.join(_NATIVE_DIR, "trackbuilder.cpp")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            # Temp + atomic rename: see data/images.py::_load_native_loader.
            tmp = f"{so}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", tmp, src],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        lib.uf_build.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.uf_build.restype = None
        _native_lib = lib
    except Exception:
        _native_lib = None
    return _native_lib


class Track:
    """A candidate 3D point: list of (image_id, kpt_idx) observations."""

    __slots__ = ("observations",)

    def __init__(self, observations: List[Tuple[int, int]]):
        self.observations = observations

    def __len__(self):
        return len(self.observations)

    def __repr__(self):
        return f"Track({self.observations})"


def _find(parent: np.ndarray, i: int) -> int:
    root = i
    while parent[root] != root:
        root = parent[root]
    while parent[i] != root:  # path compression
        parent[i], i = root, parent[i]
    return root


def build_tracks(
    n_kpts: Dict[int, int],
    match_indices: Dict[Tuple[int, int], np.ndarray],
    min_track_length: int = 2,
    max_track_length: int | None = None,
) -> List[Track]:
    """Build tracks from per-pair keypoint-index matches.

    Args:
      n_kpts: {image_id: number of keypoints}.
      match_indices: {(img_a, img_b): (M, 2) int32 keypoint index pairs}.
      min_track_length: drop components observed in fewer images.
      max_track_length: optionally truncate tracks (keep deterministic prefix
        sorted by image id) — mirrors the reference's max_track_length=16 cap
        (src/post_optimization/post_optimization.py:25).

    Returns list of Tracks ordered deterministically (by smallest node id).
    """
    images = sorted(n_kpts)
    offset: Dict[int, int] = {}
    total = 0
    for im in images:
        offset[im] = total
        total += n_kpts[im]

    edges_a: List[np.ndarray] = []
    edges_b: List[np.ndarray] = []
    for (a, b) in sorted(match_indices):
        m = match_indices[(a, b)]
        if len(m) == 0:
            continue
        edges_a.append(offset[a] + m[:, 0].astype(np.int64))
        edges_b.append(offset[b] + m[:, 1].astype(np.int64))
    ea = np.concatenate(edges_a) if edges_a else np.zeros(0, np.int64)
    eb = np.concatenate(edges_b) if edges_b else np.zeros(0, np.int64)

    lib = _load_native()
    if lib is not None:
        roots = np.empty(total, dtype=np.int64)
        ea_c = np.ascontiguousarray(ea)
        eb_c = np.ascontiguousarray(eb)
        lib.uf_build(
            total,
            ea_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            eb_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(ea_c),
            roots.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    else:  # pure-Python fallback, identical semantics
        parent = np.arange(total, dtype=np.int64)
        for x, y in zip(ea, eb):
            rx, ry = _find(parent, x), _find(parent, y)
            if rx != ry:
                r = min(rx, ry)  # smallest-id root keeps ordering stable
                parent[rx] = r
                parent[ry] = r
        roots = np.empty(total, dtype=np.int64)
        for i in range(total):
            roots[i] = _find(parent, i)

    # Node -> (image, kpt)
    img_of = np.empty(total, dtype=np.int64)
    kpt_of = np.empty(total, dtype=np.int64)
    for im in images:
        o, k = offset[im], n_kpts[im]
        img_of[o : o + k] = im
        kpt_of[o : o + k] = np.arange(k)

    order = np.argsort(roots, kind="stable")
    roots_sorted = roots[order]
    boundaries = np.flatnonzero(np.diff(roots_sorted)) + 1
    groups = np.split(order, boundaries)

    tracks: List[Track] = []
    for g in groups:
        if len(g) < min_track_length:
            continue
        obs = [(int(img_of[i]), int(kpt_of[i])) for i in g]
        # Drop images observed more than once in this component (conflict)
        counts: Dict[int, int] = {}
        for im, _ in obs:
            counts[im] = counts.get(im, 0) + 1
        obs = [(im, kp) for im, kp in obs if counts[im] == 1]
        if len(obs) < min_track_length:
            continue
        obs.sort()
        if max_track_length is not None and len(obs) > max_track_length:
            obs = obs[:max_track_length]
        tracks.append(Track(obs))
    return tracks
