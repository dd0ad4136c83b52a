"""Host-side image transforms (numpy/PIL), reconstructing the external
`dataset.transform` module's presets (imported at reference
train_CNN.py:18, selected at :154-161):

  * xception_default_data_transforms      — resize 299, normalize mean/std 0.5
  * xception_default_data_transforms_256  — resize 256
  * data_transform_aug                    — + flip/color-jitter augmentation
  * data_transforms_shuffle               — + patch-shuffle (jigsaw pretext)

Each preset is {'train': Transform, 'val': Transform}; a Transform maps one
HWC uint8 RGB frame -> float32 HWC normalized. Xception normalization is
(x/255 - 0.5) / 0.5 (reference network/xception.py:12-14,30-31).

Transforms carry their own np.random.Generator so decoding workers stay
deterministic per (seed, index) — no global RNG races.
"""
from __future__ import annotations

import io
from typing import Callable, Dict, Optional, Tuple

import numpy as np

try:
    from PIL import Image
    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


def resize(img: np.ndarray, size: int) -> np.ndarray:
    """Bilinear resize HWC uint8 -> (size, size)."""
    if img.shape[0] == size and img.shape[1] == size:
        return img
    if _HAS_PIL:
        return np.asarray(
            Image.fromarray(img).resize((size, size), Image.BILINEAR))
    # numpy fallback: nearest
    ys = (np.arange(size) * img.shape[0] / size).astype(np.int64)
    xs = (np.arange(size) * img.shape[1] / size).astype(np.int64)
    return img[ys][:, xs]


def normalize(img: np.ndarray,
              mean: Tuple[float, ...] = (0.5, 0.5, 0.5),
              std: Tuple[float, ...] = (0.5, 0.5, 0.5)) -> np.ndarray:
    x = img.astype(np.float32) / 255.0
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def jpeg_compress(img: np.ndarray, quality: int) -> np.ndarray:
    """Re-encode at the given JPEG quality — the `random_compress` /
    `compress_param` augmentation (reference train_CNN.py:172 call site)."""
    if not _HAS_PIL:
        return img
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=int(quality))
    buf.seek(0)
    return np.asarray(Image.open(buf).convert("RGB"))


def hflip(img: np.ndarray) -> np.ndarray:
    return img[:, ::-1]


def shuffle_patches(img: np.ndarray, grid: int,
                    rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
    """Split into grid x grid patches and permute them; returns
    (shuffled image, permutation) — the jigsaw pretext input whose target
    is recovered by JigsawLoss (reference loss_fn.py:262-278)."""
    h, w, c = img.shape
    ph, pw = h // grid, w // grid
    img = img[: ph * grid, : pw * grid]
    patches = img.reshape(grid, ph, grid, pw, c).transpose(0, 2, 1, 3, 4)
    patches = patches.reshape(grid * grid, ph, pw, c)
    perm = rng.permutation(grid * grid)
    shuffled = patches[perm].reshape(grid, grid, ph, pw, c)
    shuffled = shuffled.transpose(0, 2, 1, 3, 4).reshape(ph * grid, pw * grid, c)
    return shuffled, perm


class Transform:
    """Composable frame transform. All randomness flows through the `rng`
    passed to __call__ so clips transform consistently across frames."""

    def __init__(self, size: int = 299,
                 mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
                 augment: bool = False,
                 shuffle_grid: Optional[int] = None,
                 compress_range: Optional[Tuple[int, int]] = None,
                 raw_uint8: bool = False):
        """raw_uint8=True skips host-side normalization and returns the
        resized uint8 frame: 4x fewer host->device bytes, with
        `loader.device_normalize` applying the identical (x/255-mean)/std
        on device. For transfer-bound serving ingest (measured: the
        bench tunnel moves ~34 MB/s, so f32 clips cap e2e at ~9 clips/s
        where uint8 lifts the transfer ceiling 4x). Brightness jitter
        needs float frames, so raw_uint8 is for deterministic
        (Test/serving) transforms. Note: this mode decodes via PIL —
        the native C++ fast path only emits normalized f32
        (VideoSeqDataset._native_fast_path skips it); measured, the
        PIL-uint8 path is still faster end to end (no normalize pass,
        4x smaller collate/transfer payloads)."""
        self.size = size
        self.mean, self.std = mean, std
        self.augment = augment
        self.shuffle_grid = shuffle_grid
        self.compress_range = compress_range
        self.raw_uint8 = raw_uint8
        assert not (raw_uint8 and augment), \
            "raw_uint8 is a serving-ingest mode; augmentation needs floats"

    def sample_params(self, rng: np.random.Generator) -> Dict:
        """Per-clip random decisions (shared by all frames of a clip)."""
        p: Dict = {}
        if self.augment:
            p["flip"] = bool(rng.random() < 0.5)
            p["brightness"] = float(rng.uniform(0.9, 1.1))
        if self.compress_range is not None:
            lo, hi = self.compress_range
            p["quality"] = int(rng.integers(lo, hi + 1))
        if self.shuffle_grid:
            p["perm_rng"] = rng
        return p

    def __call__(self, img: np.ndarray, params: Optional[Dict] = None):
        params = params or {}
        perm = None
        if "quality" in params:
            img = jpeg_compress(img, params["quality"])
        img = resize(img, self.size)
        if params.get("flip"):
            img = hflip(img)
        if self.shuffle_grid and "perm_rng" in params:
            img, perm = shuffle_patches(img, self.shuffle_grid,
                                        params["perm_rng"])
        if self.raw_uint8:
            return (img, perm) if perm is not None else img
        x = normalize(img, self.mean, self.std)
        if "brightness" in params:
            x = x * params["brightness"]
        if perm is not None:
            return x, perm
        return x


def _preset(size: int, augment_train: bool = False,
            shuffle_grid: Optional[int] = None):
    return {
        "train": Transform(size, augment=augment_train,
                           shuffle_grid=shuffle_grid),
        "val": Transform(size),
        "test": Transform(size),
    }


# preset-name parity with the reference's transform module
xception_default_data_transforms = _preset(299)
xception_default_data_transforms_256 = _preset(256)
xception_default_data_transforms_300 = _preset(300)
data_transform_aug = _preset(299, augment_train=True)
data_transforms_shuffle = _preset(299, shuffle_grid=3)

PRESETS: Dict[str, Dict[str, Transform]] = {
    "299": xception_default_data_transforms,
    "256": xception_default_data_transforms_256,
    "300": xception_default_data_transforms_300,
    "aug": data_transform_aug,
    "shuffle": data_transforms_shuffle,
}


def select_transform(name: str) -> Dict[str, Transform]:
    """Preset selection parity with reference train_CNN.py:154-161."""
    if name not in PRESETS:
        raise KeyError(f"unknown transform preset '{name}'; have {sorted(PRESETS)}")
    return PRESETS[name]
