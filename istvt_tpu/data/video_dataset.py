"""Clip datasets — reconstruction of the external `dataset` package
(`dataset.dataset_video.VideoSeqDataset/Celeb/MixedVideoDataset`,
`dataset.dataset_oulu.OULU`; behavioral spec in SURVEY.md §2.7 from call
sites reference train_CNN.py:162-177, visualize_rel.py:244-266,
visualize_feat_map.py:163-207).

Differences from the reference (TPU-first):
  * frames come out NHWC float32 (JAX/TPU layout), not NCHW torch tensors;
  * every item is deterministic in (seed, index) — workers are stateless,
    so the loader can shard decoding across threads/hosts reproducibly;
  * items are dicts, collated into jnp-ready numpy batches by loader.py.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from istvt_tpu.data import manifest as mf
from istvt_tpu.data.transforms import Transform

try:
    from PIL import Image
    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


def _load_frame(path: str) -> np.ndarray:
    if not _HAS_PIL:
        raise RuntimeError("PIL unavailable; cannot decode frames")
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


class ClipDataset:
    """Base: len() + indexable items, deterministic per (seed, index)."""

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, index: int) -> Dict:
        raise NotImplementedError


class VideoSeqDataset(ClipDataset):
    """FF++-style clip dataset (reference call site train_CNN.py:172-173).

    Draws `seq_len` consecutive frames from a video (random start in Train,
    deterministic in Test/Vis), applies the per-frame transform with
    clip-consistent augmentation params, and returns:
      {'clips': (T,S,S,3) f32, 'labels': int,
       'fake_types': int (when return_fake_type),
       'perm': (grid²,) jigsaw permutation (when require_idx),
       'paths': list[str] (mode='Vis')}
    """

    def __init__(self, root: str = "", quality: str = "hq",
                 transform: Optional[Transform] = None,
                 get_triplet: Optional[str] = None,
                 subset: Optional[str] = None,
                 num_multi: int = 3,
                 shuffle_min_slice: int = 1,
                 require_idx: bool = False,
                 random_compress: bool = False,
                 compress_param: Optional[Sequence[int]] = None,
                 size: int = 300, mode: str = "Train",
                 dataset_len: Optional[int] = None,
                 frame_type: str = "face",
                 diverse_quality: bool = False,
                 return_fake_type: bool = False,
                 seq_len: int = 6,
                 entries: Optional[List[mf.VideoEntry]] = None,
                 seed: int = 0,
                 use_native: bool = False):
        self.root = root
        self.quality = quality
        self.transform = transform or Transform(size)
        self.size = size
        self.mode = mode
        self.get_triplet = get_triplet
        self.seq_len = seq_len
        self.require_idx = require_idx
        self.return_fake_type = return_fake_type
        self.random_compress = random_compress
        self.compress_param = compress_param
        self.diverse_quality = diverse_quality
        self.seed = seed
        self.use_native = use_native
        methods = None
        if subset and subset in mf.FFPP_METHODS:
            methods = ["original", subset]
        self.entries = entries if entries is not None else mf.scan_ffpp(
            root, quality=quality if quality else None, methods=methods,
            min_frames=seq_len)
        self._len = dataset_len if dataset_len else len(self.entries)

    def __len__(self):
        return self._len

    def _rng(self, index: int) -> np.random.Generator:
        return np.random.default_rng((self.seed, index))

    def _pick_clip(self, entry: mf.VideoEntry, rng) -> List[str]:
        n = len(entry.frames)
        t = self.seq_len
        if n <= t:
            idxs = list(range(n)) + [n - 1] * (t - n)
        elif self.mode == "Train":
            start = int(rng.integers(0, n - t + 1))
            idxs = list(range(start, start + t))
        else:
            start = (n - t) // 2
            idxs = list(range(start, start + t))
        return [entry.frames[i] for i in idxs]

    def _native_fast_path(self, paths, params) -> Optional[np.ndarray]:
        """Decode the whole clip in C++ (libjpeg/libpng + resize +
        normalize, istvt_tpu/native) when no Python-side augmentation is
        active and the normalization is the plain Xception mean/std.

        Explicit opt-in (use_native=True): the native bilinear downscale
        is a 2-tap filter while PIL's Image.BILINEAR antialiases, so the
        two paths produce slightly different pixels — the default keeps
        train/eval numerics environment-independent."""
        if not self.use_native:
            return None
        t = self.transform
        if params or t.shuffle_grid or t.compress_range or t.augment \
                or getattr(t, "raw_uint8", False):
            return None
        if tuple(t.mean) != (0.5, 0.5, 0.5) or tuple(t.std) != (0.5, 0.5, 0.5):
            return None
        try:
            from istvt_tpu import native
            if not native.available():
                return None
            n_threads = min(len(paths), os.cpu_count() or 1)
            return native.decode_frames(paths, t.size, 0.5, 0.5,
                                        n_threads=n_threads)
        except Exception:
            return None

    def __getitem__(self, index: int) -> Dict:
        entry = self.entries[index % len(self.entries)]
        rng = self._rng(index)
        paths = self._pick_clip(entry, rng)
        params = self.transform.sample_params(rng)
        if self.random_compress and self.compress_param and \
                self.mode == "Train" and "quality" not in params:
            lo, hi = self.compress_param[0], self.compress_param[-1]
            if rng.random() < 0.5:
                params["quality"] = int(rng.integers(lo, hi + 1))
        perm = None
        clip = self._native_fast_path(paths, params)
        if clip is None:
            frames = []
            for p in paths:
                out = self.transform(_load_frame(p), params)
                if isinstance(out, tuple):
                    out, perm = out
                frames.append(out)
            clip = np.stack(frames)
            if clip.dtype != np.uint8:       # raw_uint8 ingest stays u8
                clip = clip.astype(np.float32)
        item: Dict = {
            "clips": clip,
            "labels": np.int32(entry.label),
        }
        if self.return_fake_type:
            item["fake_types"] = np.int32(entry.fake_type)
        if self.require_idx and perm is not None:
            item["perm"] = perm.astype(np.int32)
        if self.mode == "Vis":
            item["paths"] = paths
        if self.get_triplet and self.get_triplet != "Test" and \
                self.mode == "Train":
            item.update(self._sample_triplet(entry, rng, params))
        return item

    def _sample_triplet(self, anchor: mf.VideoEntry, rng, params) -> Dict:
        """Triplet companions (reference `get_triplet` kwarg,
        train_CNN.py:172): positive = another clip with the anchor's
        label, negative = a clip of the opposite label."""
        same = [i for i, e in enumerate(self.entries)
                if e.label == anchor.label and e is not anchor]
        diff = [i for i, e in enumerate(self.entries)
                if e.label != anchor.label]
        out: Dict = {}
        for key, pool in (("clips_pos", same), ("clips_neg", diff)):
            if not pool:
                out[key] = None
                continue
            e = self.entries[pool[int(rng.integers(0, len(pool)))]]
            frames = []
            for pth in self._pick_clip(e, rng):
                o = self.transform(_load_frame(pth), params)
                frames.append(o[0] if isinstance(o, tuple) else o)
            out[key] = np.stack(frames).astype(np.float32)
        if out["clips_pos"] is None or out["clips_neg"] is None:
            return {}
        return out


class Celeb(VideoSeqDataset):
    """Celeb-DF dataset (reference call site train_CNN.py:166-170):
    two-class real/synthesis tree; optional paired hq/lq returns."""

    def __init__(self, root: str = "", num_multi: int = 3, mode: str = "Train",
                 shuffle_min_slice: int = 1, require_idx: bool = False,
                 compress_param: Optional[Sequence[int]] = None,
                 pair_return: bool = False, fixed_qual: bool = False,
                 random_test_qual: bool = False, size: int = 300,
                 seq_len: int = 6, transform: Optional[Transform] = None,
                 entries=None, seed: int = 0, dataset_len=None):
        ent = entries if entries is not None else mf.scan_binary_tree(
            root, min_frames=seq_len)
        super().__init__(root=root, transform=transform, size=size, mode=mode,
                         seq_len=seq_len, require_idx=require_idx,
                         compress_param=compress_param, entries=ent,
                         seed=seed, dataset_len=dataset_len)
        self.pair_return = pair_return
        self.fixed_qual = fixed_qual
        self.random_test_qual = random_test_qual

    def __getitem__(self, index: int) -> Dict:
        item = super().__getitem__(index)
        rng = self._rng(index)
        if self.pair_return and self.compress_param:
            # paired hq/lq view of the same clip for distillation
            # (RepresentationLoss, reference loss_fn.py:30-67)
            q = int(self.compress_param[0])
            lq = np.stack([
                self.transform(_load_frame(p), {"quality": q})
                for p in self._pick_clip(
                    self.entries[index % len(self.entries)], self._rng(index))
            ]).astype(np.float32)
            item["clips_lq"] = lq
            item["qual"] = np.int32(1)
        elif self.random_test_qual and self.compress_param:
            if rng.random() < 0.5:
                item["qual"] = np.int32(0)
        return item


class OULU(VideoSeqDataset):
    """OULU-NPU presentation-attack dataset (reference call site
    train_CNN.py:163-164; ACER eval at :885-893). Live=0, attack=1."""

    def __init__(self, root: str = "", num_multi: int = 3, mode: str = "Train",
                 shuffle_min_slice: int = 1, size: int = 300,
                 seq_len: int = 6, transform: Optional[Transform] = None,
                 entries=None, seed: int = 0, dataset_len=None):
        ent = entries if entries is not None else mf.scan_binary_tree(
            root, min_frames=seq_len)
        super().__init__(root=root, transform=transform, size=size, mode=mode,
                         seq_len=seq_len, entries=ent, seed=seed,
                         dataset_len=dataset_len)


class MixedVideoDataset(ClipDataset):
    """Multi-source eval set with switchable quality
    (reference visualize_feat_map.py:163-207 `set_quality('hq'/'lq')`)."""

    def __init__(self, root: str = "", size: int = 300, seq_len: int = 6,
                 transform: Optional[Transform] = None, seed: int = 0):
        self.root = root
        self.size = size
        self.seq_len = seq_len
        self.transform = transform
        self.seed = seed
        self.quality = "hq"
        self._build()

    def _build(self):
        self.inner = VideoSeqDataset(
            root=self.root, quality=self.quality, transform=self.transform,
            size=self.size, mode="Test", seq_len=self.seq_len,
            return_fake_type=True, seed=self.seed)

    def set_quality(self, quality: str):
        self.quality = quality
        self._build()

    def __len__(self):
        return len(self.inner)

    def __getitem__(self, index: int):
        return self.inner[index]


class SyntheticVideoDataset(ClipDataset):
    """Deterministic synthetic clips for tests/benchmarks (no disk needed).

    'Fake' clips carry a temporal artifact — per-frame independent noise in
    a moving patch — exactly the signal the self-subtract temporal
    attention (reference module.py:193) is built to detect, so tiny models
    can overfit it in smoke tests.

    static_patch=True pins the artifact patch to ONE (per-clip random)
    location across frames instead of moving it: the noise is still
    temporally decorrelated (the detection signal is unchanged) but now
    also spatially consistent, so LRP spatial relevance (cam_s) has a
    localizable ground truth — used by the held-out capability test
    (tests/test_e2e_learning.py) to assert saliency maps point at the
    manipulated region, the reference's visualize_rel.py:257-294 contract.
    patch_size overrides the default size//8 artifact extent.
    """

    def __init__(self, num_clips: int = 64, seq_len: int = 6,
                 size: int = 300, seed: int = 0,
                 static_patch: bool = False, patch_size: int | None = None,
                 amp_range: tuple | None = None):
        self.num_clips = num_clips
        self.seq_len = seq_len
        self.size = size
        self.seed = seed
        self.static_patch = static_patch
        self.patch_size = patch_size
        self.amp_range = amp_range

    def __len__(self):
        return self.num_clips

    def __getitem__(self, index: int) -> Dict:
        rng = np.random.default_rng((self.seed, index))
        label = index % 2
        base = rng.normal(0, 0.3, (self.size, self.size, 3)).astype(np.float32)
        clip = np.stack([base] * self.seq_len)
        # smooth global motion
        for t in range(self.seq_len):
            clip[t] = np.roll(clip[t], shift=t, axis=1)
        y = x = -1
        amp = 1.0
        if label == 1:
            ps = self.patch_size or max(self.size // 8, 2)
            if self.amp_range is not None:
                # graded artifact STRENGTH (noise std), deterministic per
                # index — gives val logits a meaningful within-class
                # ranking (teacher-fidelity rank correlation in
                # train/certify.py is noise on a saturated fixed-amp task)
                amp = float(rng.uniform(*self.amp_range))
            y = x = None
            for t in range(self.seq_len):
                if y is None or not self.static_patch:
                    y = int(rng.integers(0, self.size - ps))
                    x = int(rng.integers(0, self.size - ps))
                clip[t, y:y + ps, x:x + ps] += (amp * rng.normal(
                    0, 1.0, (ps, ps, 3))).astype(np.float32)
        out = {"clips": clip, "labels": np.int32(label),
               "fake_types": np.int32(label)}
        if self.amp_range is not None:
            out["amp"] = np.float32(amp if label == 1 else 0.0)
        if self.static_patch:
            # localization ground truth: top-left of the (fixed) artifact
            # patch, (-1,-1) for real clips — consumed by the LRP
            # capability test to name the manipulated feature cells
            out["patch_yx"] = np.array([y, x], np.int32)
        return out
