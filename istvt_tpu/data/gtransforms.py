"""Group (whole-clip) video transforms — the I3D/Kinetics pipeline
(reference network/resnet3d/utils/gtransforms.py, util.py:6-57).

A "group" is a list/stack of frames from one clip; every transform applies
the SAME random decision to all frames (crop window, flip) so the clip
stays temporally consistent. Kinetics normalization: mean
(114.75, 114.75, 114.75), std (57.375,)*3 (reference util.py:6-9).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from istvt_tpu.data.transforms import resize as _resize_one

KINETICS_MEAN = (114.75, 114.75, 114.75)
KINETICS_STD = (57.375, 57.375, 57.375)


def group_resize(clip: np.ndarray, size: int) -> np.ndarray:
    """clip (T, H, W, C) uint8 -> shorter-side-free square resize."""
    return np.stack([_resize_one(f, size) for f in clip])


def group_random_crop(clip: np.ndarray, size: int,
                      rng: np.random.Generator) -> np.ndarray:
    t, h, w, c = clip.shape
    y = int(rng.integers(0, h - size + 1))
    x = int(rng.integers(0, w - size + 1))
    return clip[:, y:y + size, x:x + size]


def group_center_crop(clip: np.ndarray, size: int) -> np.ndarray:
    t, h, w, c = clip.shape
    y = (h - size) // 2
    x = (w - size) // 2
    return clip[:, y:y + size, x:x + size]


def group_random_flip(clip: np.ndarray,
                      rng: np.random.Generator) -> np.ndarray:
    if rng.random() < 0.5:
        return clip[:, :, ::-1]
    return clip


def group_normalize(clip: np.ndarray,
                    mean=KINETICS_MEAN, std=KINETICS_STD) -> np.ndarray:
    x = clip.astype(np.float32)
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def three_crops(clip: np.ndarray, size: int) -> np.ndarray:
    """Left/center/right (or top/middle/bottom) crops for multi-crop eval
    (reference resnet.py:191-202 forward_multi's 3 spatial crops).
    -> (3, T, size, size, C)."""
    t, h, w, c = clip.shape
    crops = []
    if w >= h:
        xs = [0, (w - size) // 2, w - size]
        y = (h - size) // 2
        for x in xs:
            crops.append(clip[:, y:y + size, x:x + size])
    else:
        ys = [0, (h - size) // 2, h - size]
        x = (w - size) // 2
        for y in ys:
            crops.append(clip[:, y:y + size, x:x + size])
    return np.stack(crops)


def clip_transform(split: str, size: int = 224,
                   rng: Optional[np.random.Generator] = None):
    """Pipeline factory (reference util.py:24-57): train = resize ->
    random crop -> flip -> normalize; val = resize -> center crop ->
    normalize; 3crop = resize -> three_crops -> normalize."""
    rng = rng or np.random.default_rng(0)

    def train(clip):
        clip = group_resize(clip, int(size * 1.14))
        clip = group_random_crop(clip, size, rng)
        clip = group_random_flip(clip, rng)
        return group_normalize(clip)

    def val(clip):
        clip = group_resize(clip, int(size * 1.14))
        clip = group_center_crop(clip, size)
        return group_normalize(clip)

    def crop3(clip):
        clip = group_resize(clip, int(size * 1.14))
        crops = three_crops(clip, size)
        return np.stack([group_normalize(cr) for cr in crops])

    return {"train": train, "val": val, "3crop": crop3}[split]
