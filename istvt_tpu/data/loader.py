"""Prefetching clip loader + sharded device feed.

Replaces the reference's `torch.utils.data.DataLoader(bs=16, workers=8)`
(reference train_CNN.py:176-177) with a thread-pool decoder and a
double-buffered device feed: while the mesh computes step N, batch N+1 is
already decoded and transferring H2D, sharded over the 'data' axis
(the SPMD analog of DataParallel's scatter, train_CNN.py:185-186).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np


def collate(items: List[Dict]) -> Dict[str, np.ndarray]:
    """Stack a list of item dicts into one batch dict (paths stay lists)."""
    out: Dict = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]) or \
                isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[k] = np.stack([np.asarray(v) for v in vals])
        else:
            out[k] = vals
    return out


class ClipLoader:
    """Iterable over shuffled, decoded, collated batches.

    Per-epoch order is deterministic in (seed, epoch). Decoding fans out
    over `num_workers` threads (PIL decode releases the GIL); `prefetch`
    batches are staged ahead of the consumer.
    """

    def __init__(self, dataset, batch_size: int = 16, shuffle: bool = True,
                 drop_last: bool = False, num_workers: int = 8,
                 prefetch: int = 2, seed: int = 0,
                 host_count: int = 1, host_index: int = 0):
        """batch_size is the GLOBAL batch. Under multi-host SPMD pass
        host_count=jax.process_count(), host_index=jax.process_index():
        every host derives the SAME global order from (seed, epoch) and
        decodes only its batch_size/host_count slice of each batch —
        the host-decode analog of the 'data'-axis sharding (and the v5e-8
        aggregate decode budget is met by adding hosts, BASELINE.md)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.prefetch = max(prefetch, 1)
        self.seed = seed
        self.epoch = 0
        assert 0 <= host_index < host_count, (host_index, host_count)
        if host_count > 1:
            assert batch_size % host_count == 0, \
                f"global batch {batch_size} not divisible by {host_count} hosts"
            # ragged final batches are NOT multi-host safe: hosts would
            # hold unequal slices (desynced collectives / uneven
            # process-local assembly) — require full batches up front
            assert drop_last or len(dataset) % batch_size == 0, (
                "multi-host ClipLoader requires drop_last=True or a "
                f"dataset length divisible by the global batch "
                f"({len(dataset)} % {batch_size} != 0)")
        self.host_count = host_count
        self.host_index = host_index

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> List[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState((self.seed, self.epoch)).shuffle(order)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, n, self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        if self.host_count > 1:
            # this host's contiguous slice of every (full, per the
            # __init__ contract) global batch — same batch COUNT on
            # every host, so the SPMD loop stays in lockstep
            per = self.batch_size // self.host_count
            batches = [b[self.host_index * per:(self.host_index + 1) * per]
                       for b in batches]
        return batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._index_batches()
        stop = threading.Event()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for idxs in batches:
                    if stop.is_set():
                        return
                    items = list(pool.map(self.dataset.__getitem__, idxs))
                    q.put(collate(items))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def device_normalize(x, mean=0.5, std=0.5, dtype=None):
    """On-device ingest normalization for raw_uint8 clips: the exact
    Xception (x/255 - mean)/std that transforms.normalize applies on
    host (reference network/xception.py:12-14) — jittable, fuses into
    the stem's first conv. Shipping uint8 and normalizing here cuts
    host->device bytes 4x vs f32 clips (the serving-ingest bottleneck
    through constrained links)."""
    import jax.numpy as jnp
    dtype = dtype or jnp.float32
    x = x.astype(dtype) / jnp.asarray(255.0, dtype)
    return (x - jnp.asarray(mean, dtype)) / jnp.asarray(std, dtype)


def device_feed(loader, mesh=None, pad_to_batch: Optional[int] = None):
    """Wrap a ClipLoader: device_put each batch sharded over the mesh's
    'data' axis (double-buffered — device transfer of batch N+1 overlaps
    compute on batch N since device_put is async)."""
    import jax
    from istvt_tpu.parallel import sharding as shd

    def put(batch):
        arrays = {k: v for k, v in batch.items()
                  if isinstance(v, np.ndarray)}
        rest = {k: v for k, v in batch.items()
                if not isinstance(v, np.ndarray)}
        if pad_to_batch:
            def pad(x):
                b = x.shape[0]
                if b >= pad_to_batch:
                    return x
                reps = [(0, pad_to_batch - b)] + [(0, 0)] * (x.ndim - 1)
                return np.pad(x, reps)
            mask = np.arange(pad_to_batch) < arrays["labels"].shape[0]
            arrays = {k: pad(v) for k, v in arrays.items()}
            arrays["valid"] = mask
        if mesh is not None:
            if jax.process_count() > 1:
                # multi-host: each host must hold only ITS slice of the
                # global batch — require a host-sliced loader (feeding
                # full batches here would silently duplicate data into a
                # process_count-times-larger global batch)
                if getattr(loader, "host_count", 1) != jax.process_count():
                    raise ValueError(
                        "multi-process mesh needs a host-sliced loader: "
                        "ClipLoader(..., host_count=jax.process_count(), "
                        "host_index=jax.process_index())")
                shardings = shd.batch_shardings(arrays, mesh)
                arrays = {
                    k: jax.make_array_from_process_local_data(
                        shardings[k], v)
                    for k, v in arrays.items()
                }
            else:
                arrays = shd.place(arrays,
                                   shd.batch_shardings(arrays, mesh))
        else:
            arrays = jax.device_put(arrays)
        arrays.update(rest)
        return arrays

    for batch in loader:
        yield put(batch)
