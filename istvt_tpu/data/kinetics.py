"""Kinetics-style action-recognition clip dataset (reference
network/resnet3d/data/kinetics.py:1-140): CSV annotations -> per-clip
frame folders `frames/<label>/<ytid>_<start>_<end>/*.jpg`; items are
`clip_len`-frame clips with integer class labels, transformed by the
group pipelines in data/gtransforms.py. Feeds the I3D models."""
from __future__ import annotations

import csv
import glob
import json
import os
from typing import Dict, List, Optional

import numpy as np

from istvt_tpu.data import gtransforms as G
from istvt_tpu.data.video_dataset import ClipDataset, _load_frame


def parse_annotations(root: str, cache: Optional[str] = None) -> Dict:
    """Scan `annotations/kinetics-400_{train,val}.csv` + `frames/` into
    {'train_data', 'val_data', 'labels'} (reference kinetics.py:11-38;
    the torch.save cache becomes JSON)."""
    frame_dir = os.path.join(root, "frames")

    def parse(path):
        data = []
        labels = set()
        with open(path) as f:
            for row in csv.DictReader(f):
                label = row["label"].strip('"')
                labels.add(label)
        label_list = sorted(labels)
        with open(path) as f:
            for row in csv.DictReader(f):
                label = row["label"].strip('"')
                ytid = row["youtube_id"]
                start = int(float(row["time_start"]))
                end = int(float(row["time_end"]))
                frames = sorted(glob.glob(
                    f"{frame_dir}/{label}/{ytid}_{start:06d}_{end:06d}/*.jpg"))
                if frames:
                    data.append({"frames": frames,
                                 "label": label_list.index(label)})
        return data, label_list

    train_data, labels = parse(
        os.path.join(root, "annotations", "kinetics-400_train.csv"))
    val_data, _ = parse(
        os.path.join(root, "annotations", "kinetics-400_val.csv"))
    ann = {"train_data": train_data, "val_data": val_data, "labels": labels}
    if cache:
        with open(cache, "w") as f:
            json.dump(ann, f)
    return ann


class Kinetics(ClipDataset):
    """Items: {'clips': (T,S,S,3) f32 Kinetics-normalized, 'labels': int}.
    split='val' uses center crops; split='3crop' returns
    (3, T, S, S, 3) multi-crop clips for i3d_forward_multi."""

    def __init__(self, root: str, split: str = "train", clip_len: int = 32,
                 size: int = 224, annotations: Optional[Dict] = None,
                 seed: int = 0):
        self.root = root
        self.split = split
        self.clip_len = clip_len
        self.size = size
        self.seed = seed
        if annotations is None:
            cache = os.path.join(root, "kinetics_data.json")
            if os.path.exists(cache):
                with open(cache) as f:
                    annotations = json.load(f)
            else:
                annotations = parse_annotations(root, cache)
        self.labels = annotations["labels"]
        self.data = annotations["train_data"] if split == "train" \
            else annotations["val_data"]

    def __len__(self):
        return len(self.data)

    def __getitem__(self, index: int) -> Dict:
        entry = self.data[index]
        rng = np.random.default_rng((self.seed, index))
        frames = entry["frames"]
        n = len(frames)
        t = self.clip_len
        if n <= t:
            idxs = list(range(n)) + [n - 1] * (t - n)
        elif self.split == "train":
            start = int(rng.integers(0, n - t + 1))
            idxs = range(start, start + t)
        else:
            start = (n - t) // 2
            idxs = range(start, start + t)
        clip = np.stack([_load_frame(frames[i]) for i in idxs])
        tf = G.clip_transform(
            "train" if self.split == "train" else
            ("3crop" if self.split == "3crop" else "val"),
            size=self.size, rng=rng)
        return {"clips": tf(clip).astype(np.float32),
                "labels": np.int32(entry["label"])}
