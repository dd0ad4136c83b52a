"""Attention-map .npy side dumps during (pair) training.

The reference saves the first ensemble branch's spatial-attention map
every 1000 pair-training iterations (reference train_CNN.py:396-401:
`np.save('s_attns_npe.npy', s_attns[0]...)` /
`np.save('s_attns_p_npe.npy', s_attns_p[0]...)`) for offline
interpretability inspection. Here the maps travel in the step's metrics
dict (train/branches.py make_adversarial_train_step(return_attns=True))
and this host-side dumper, installed as a Trainer step_hook
(cli/train.py --dump_attns_every), writes them out."""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

# metrics key -> output filename (the reference's names, train_CNN.py:399-400)
_FILES = {"s_attns": "s_attns_npe.npy", "s_attns_p": "s_attns_p_npe.npy"}


class AttnDumper:
    """Callable (iteration, metrics) -> None; saves any attention-map
    metrics keys every `every` iterations (reference cadence: 1000)."""

    def __init__(self, out_dir: str, every: int = 1000):
        self.out_dir = out_dir
        self.every = max(int(every), 1)

    def __call__(self, iteration: int, metrics: Dict) -> None:
        if iteration % self.every != 0:
            return
        wrote = False
        for key, fname in _FILES.items():
            if key in metrics:
                if not wrote:
                    os.makedirs(self.out_dir, exist_ok=True)
                np.save(os.path.join(self.out_dir, fname),
                        np.asarray(metrics[key], dtype=np.float32))
                wrote = True
