"""Saliency-map rendering: upsample -> minmax -> JET overlay -> PNG.

Replicates the reference's overlay pipeline (visualize_rel.py:260-294,
show_cam_on_image :39-44): each 19x19 relevance map is bilinearly
upsampled x16 to 304x304, min-max normalized, colorized with the JET
colormap, added to the (0..1) RGB frame, and renormalized by the max.
cv2 is replaced with a numpy JET ramp + PIL for IO.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def bilinear_upsample(m: np.ndarray, scale: int = 16) -> np.ndarray:
    """Bilinear x`scale` upsample of a 2D map (torch interpolate
    align_corners=False semantics, visualize_rel.py:263)."""
    h, w = m.shape
    oh, ow = h * scale, w * scale
    ys = (np.arange(oh) + 0.5) / scale - 0.5
    xs = (np.arange(ow) + 0.5) / scale - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    top = m[y0][:, x0] * (1 - wx) + m[y0][:, x1] * wx
    bot = m[y1][:, x0] * (1 - wx) + m[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def minmax(m: np.ndarray) -> np.ndarray:
    lo, hi = float(m.min()), float(m.max())
    return (m - lo) / (hi - lo + 1e-12)


def jet(m: np.ndarray) -> np.ndarray:
    """JET colormap (OpenCV COLORMAP_JET equivalent): 0 -> blue, 0.5 ->
    green, 1 -> red. Input in [0,1], output float RGB in [0,1]."""
    m = np.clip(m, 0.0, 1.0)
    v = 4.0 * m
    r = np.clip(np.minimum(v - 1.5, -v + 4.5), 0, 1)
    g = np.clip(np.minimum(v - 0.5, -v + 3.5), 0, 1)
    b = np.clip(np.minimum(v + 0.5, -v + 2.5), 0, 1)
    return np.stack([r, g, b], axis=-1)


def show_cam_on_image(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """img: float RGB [0,1] HWC; mask: [0,1] HW -> uint8 overlay
    (reference visualize_rel.py:39-44)."""
    heat = jet(mask)
    cam = heat + img.astype(np.float32)
    cam = cam / max(float(cam.max()), 1e-12)
    return np.uint8(255 * cam)


def render_saliency(cam: np.ndarray, frame: Optional[np.ndarray] = None,
                    grid: int = 19, scale: int = 16) -> np.ndarray:
    """cam: (hw,) relevance -> uint8 overlay at (grid*scale)² (304² for the
    paper geometry, visualize_rel.py:263-266)."""
    m = minmax(bilinear_upsample(cam.reshape(grid, grid).astype(np.float32),
                                 scale))
    size = grid * scale
    if frame is None:
        frame = np.zeros((size, size, 3), np.float32)
    else:
        frame = _resize_rgb(frame, size).astype(np.float32)
        if frame.max() > 1.5:
            frame = frame / 255.0
    return show_cam_on_image(frame, m)


def _resize_rgb(img: np.ndarray, size: int) -> np.ndarray:
    try:
        from PIL import Image
        return np.asarray(Image.fromarray(
            np.uint8(np.clip(img, 0, 255))).resize((size, size),
                                                   Image.BILINEAR))
    except Exception:
        ys = (np.arange(size) * img.shape[0] / size).astype(int)
        xs = (np.arange(size) * img.shape[1] / size).astype(int)
        return img[ys][:, xs]


def save_png(path: str, img: np.ndarray):
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(img).save(path)
