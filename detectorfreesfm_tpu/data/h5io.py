"""HDF5 keypoint/match stores (same on-disk protocol as the reference's
src/utils/data_io.py:42-68: '/' in keys escaped as '+')."""

from __future__ import annotations

from typing import Dict

import numpy as np

try:
    import h5py

    HAS_H5PY = True
except Exception:  # pragma: no cover - h5py is baked into the image
    HAS_H5PY = False


def _escape(k: str) -> str:
    return k.replace("/", "+")


def _unescape(k: str) -> str:
    return k.replace("+", "/")


def save_h5(d: Dict[str, np.ndarray], path: str) -> None:
    """Atomic write (tmp + os.replace): a kill mid-write must not leave a
    truncated artifact that a resuming run treats as a completed stage."""
    import os

    if not HAS_H5PY:
        np.savez(path + ".npz.tmp", **{_escape(k): v for k, v in d.items()})
        # np.savez appends .npz to names without it
        os.replace(path + ".npz.tmp.npz", path + ".npz")
        return
    tmp = path + ".tmp"
    with h5py.File(tmp, "w") as f:
        for k, v in d.items():
            f.create_dataset(_escape(k), data=np.asarray(v))
    os.replace(tmp, path)


def load_h5(path: str) -> Dict[str, np.ndarray]:
    if not HAS_H5PY:
        with np.load(path + ".npz") as z:
            return {_unescape(k): z[k] for k in z.files}
    out = {}
    with h5py.File(path, "r") as f:
        for k in f.keys():
            out[_unescape(k)] = f[k][()]
    return out
