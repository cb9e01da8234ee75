"""Image loading / resizing / padding for static-shape TPU batches.

Mirrors the behavior contract of the reference's pair dataset
(src/dataset/utils.py:14-160: long-side resize, divisor snapping, pad to a
fixed square) but is numpy/PIL-only and always emits *static* shapes so that
batches of pairs compile to one XLA program per shape bucket.
"""

from __future__ import annotations

import dataclasses

import numpy as np

try:
    from PIL import Image as PILImage

    HAS_PIL = True
except Exception:  # pragma: no cover
    HAS_PIL = False


@dataclasses.dataclass
class LoadedImage:
    """A grayscale image resized to fit (target, target) and zero-padded.

    scale maps network coords back to original pixels: orig = net * scale.
    """

    data: np.ndarray  # (H_pad, W_pad) float32 in [0, 1]
    scale: np.ndarray  # (2,) float32 (sx, sy)
    orig_size: tuple  # (W, H) of the file on disk
    valid_size: tuple  # (w, h) of the live region inside the padded frame


def _resize_dims(w: int, h: int, long_side: int, df: int) -> tuple:
    """Scale so max(w, h) == long_side, then snap each dim down to the
    divisor grid (df=8 keeps 1/8-resolution features integral)."""
    scale = long_side / max(w, h)
    nw, nh = int(round(w * scale)), int(round(h * scale))
    nw = max(df, (nw // df) * df)
    nh = max(df, (nh // df) * df)
    return nw, nh


_native_loader = None
_native_loader_tried = False


def _load_native_loader():
    """C++ JPEG/PNG decode+resize (native/imageloader.cpp), built on demand.
    ctypes releases the GIL, so the engines' thread pools decode truly in
    parallel (the reference's DataLoader-worker role). None -> PIL path."""
    global _native_loader, _native_loader_tried
    if _native_loader_tried:
        return _native_loader
    _native_loader_tried = True
    import ctypes
    import os
    import subprocess

    ndir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")
    so = os.path.join(ndir, "libimageloader.so")
    src = os.path.join(ndir, "imageloader.cpp")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            # Build to a temp path + atomic rename: concurrent processes
            # (multi-host training launches several at once) must never
            # CDLL a half-written .so or truncate one already dlopen'd.
            tmp = f"{so}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", tmp, src, "-ljpeg", "-lpng"],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        lib.decode_gray_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ]
        lib.decode_gray_resize.restype = ctypes.c_int
        _native_loader = lib
    except Exception:
        _native_loader = None
    return _native_loader


def load_gray(
    path: str, long_side: int = 832, df: int = 8, pad_to: int | None = None,
    backend: str = "auto",
) -> LoadedImage:
    """Grayscale + Pillow-style triangle resize + zero-pad to a square.

    backend: "auto" (native C++ when buildable, else PIL), "native", "pil".
    The native path is numerically within ~1/255 of PIL (identical resize
    filter; JPEG luma comes from the Y channel directly instead of PIL's
    YCbCr->RGB->L double rounding)."""
    import ctypes

    tgt = pad_to if pad_to is not None else long_side
    if backend != "pil":
        lib = _load_native_loader()
        if lib is not None:
            out = np.zeros((tgt, tgt), dtype=np.float32)
            meta = np.zeros(4, dtype=np.int32)
            rc = lib.decode_gray_resize(
                path.encode(), long_side, df, tgt,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            )
            if rc == 0:
                w0, h0, nw, nh = (int(v) for v in meta)
                scale = np.array([w0 / nw, h0 / nh], dtype=np.float32)
                return LoadedImage(out, scale, (w0, h0), (nw, nh))
            if backend == "native":
                raise RuntimeError(
                    f"native image loader failed on {path} (rc={rc})")
            # else: fall through to PIL (e.g. exotic format)
    if not HAS_PIL:
        raise RuntimeError("PIL unavailable")
    img = PILImage.open(path).convert("L")
    w0, h0 = img.size
    nw, nh = _resize_dims(w0, h0, long_side, df)
    img = img.resize((nw, nh), PILImage.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    out = np.zeros((tgt, tgt), dtype=np.float32)
    out[:nh, :nw] = arr
    scale = np.array([w0 / nw, h0 / nh], dtype=np.float32)
    return LoadedImage(out, scale, (w0, h0), (nw, nh))


def load_rgb_mean_color(path: str) -> np.ndarray:
    """Mean RGB of the image (used for cheap 3D-point color extraction)."""
    img = PILImage.open(path).convert("RGB")
    return np.asarray(img, dtype=np.float32).reshape(-1, 3).mean(0)


def sample_colors(path: str, xys: np.ndarray) -> np.ndarray:
    """Nearest-pixel RGB at keypoint locations (COLMAP color extraction
    equivalent — reference delegates this to COLMAP's extract_colors)."""
    img = PILImage.open(path).convert("RGB")
    arr = np.asarray(img, dtype=np.uint8)
    h, w = arr.shape[:2]
    x = np.clip(np.round(xys[:, 0] - 0.5).astype(np.int64), 0, w - 1)
    y = np.clip(np.round(xys[:, 1] - 0.5).astype(np.int64), 0, h - 1)
    return arr[y, x]
