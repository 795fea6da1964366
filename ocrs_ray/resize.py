"""Bilinear image resize (ONNX `half_pixel` linear mode), vectorized.

Equivalent surface to rten's `resize_image` (ONNX Resize, linear,
half_pixel coordinate transform) as used at
/root/reference/ocrs/src/detection.rs:167-171,187-194 and
/root/reference/ocrs/src/recognition.rs:119-121.
"""

from __future__ import annotations

import numpy as np

__all__ = ["resize_bilinear"]


def _axis_weights(in_size: int, out_size: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Source indices (lo, hi) and hi-weights for one axis."""
    if out_size == in_size:
        idx = np.arange(in_size)
        return idx, idx, np.zeros(in_size, dtype=np.float32)
    scale = out_size / in_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) / scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)
    return lo, hi, w_hi


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Resize the last two axes of `img` to (out_h, out_w).

    Accepts (..., H, W) float arrays; returns float32.
    """
    img = np.asarray(img, dtype=np.float32)
    h, w = img.shape[-2], img.shape[-1]
    if h == out_h and w == out_w:
        return img
    ylo, yhi, wy = _axis_weights(h, out_h)
    xlo, xhi, wx = _axis_weights(w, out_w)
    # Interpolate along H.
    top = img[..., ylo, :]
    bot = img[..., yhi, :]
    rows = top + (bot - top) * wy[:, None]
    # Interpolate along W.
    left = rows[..., :, xlo]
    right = rows[..., :, xhi]
    return left + (right - left) * wx[None, :]
