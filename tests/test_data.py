"""Data pipeline tests: manifest scan, transforms, datasets, loader."""
import os

import numpy as np
import pytest

from istvt_tpu.data import (
    Celeb,
    ClipLoader,
    MixedVideoDataset,
    SyntheticVideoDataset,
    Transform,
    VideoSeqDataset,
    collate,
    scan_ffpp,
    select_transform,
    split_train_val,
)
from istvt_tpu.data.transforms import jpeg_compress, shuffle_patches

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _make_ffpp_tree(root, quality=("hq", "lq"), methods=("original", "Deepfakes"),
                    videos=2, frames=8, size=32):
    rng = np.random.RandomState(0)
    for q in quality:
        for m in methods:
            for v in range(videos):
                d = os.path.join(root, q, m, f"{v:03d}")
                os.makedirs(d, exist_ok=True)
                for f in range(frames):
                    img = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
                    Image.fromarray(img).save(os.path.join(d, f"{f:04d}.png"))


def test_scan_ffpp_and_split(tmp_path):
    root = str(tmp_path)
    _make_ffpp_tree(root)
    entries = scan_ffpp(root, quality="hq")
    assert len(entries) == 4
    labels = sorted(e.label for e in entries)
    assert labels == [0, 0, 1, 1]
    assert all(len(e.frames) == 8 for e in entries)
    tr, va = split_train_val(entries, val_fraction=0.25, seed=0)
    assert len(tr) == 3 and len(va) == 1


def test_video_seq_dataset_items(tmp_path):
    root = str(tmp_path)
    _make_ffpp_tree(root)
    ds = VideoSeqDataset(root=root, quality="hq", size=32, seq_len=4,
                         mode="Train", return_fake_type=True,
                         transform=Transform(32))
    assert len(ds) == 4
    item = ds[0]
    assert item["clips"].shape == (4, 32, 32, 3)
    assert item["clips"].dtype == np.float32
    # normalization (x/255 - .5)/.5 -> range [-1, 1]
    assert item["clips"].min() >= -1.001 and item["clips"].max() <= 1.001
    assert item["labels"] in (0, 1)
    assert "fake_types" in item
    # determinism per (seed, index)
    again = ds[0]
    np.testing.assert_array_equal(item["clips"], again["clips"])


def test_triplet_sampling(tmp_path):
    root = str(tmp_path)
    _make_ffpp_tree(root)
    ds = VideoSeqDataset(root=root, quality="hq", size=32, seq_len=4,
                         mode="Train", get_triplet="BCE",
                         transform=Transform(32))
    item = ds[0]
    assert "clips_pos" in item and "clips_neg" in item
    assert item["clips_pos"].shape == item["clips"].shape
    # positive shares the label, negative flips it (by construction the
    # tree has 2 real + 2 fake videos per quality)
    again = ds[0]
    np.testing.assert_array_equal(item["clips_neg"], again["clips_neg"])


def test_vis_mode_returns_paths(tmp_path):
    root = str(tmp_path)
    _make_ffpp_tree(root)
    ds = VideoSeqDataset(root=root, quality="hq", size=32, seq_len=4,
                         mode="Vis", transform=Transform(32))
    item = ds[0]
    assert len(item["paths"]) == 4
    assert all(os.path.exists(p) for p in item["paths"])


def test_loader_batches_and_determinism(tmp_path):
    ds = SyntheticVideoDataset(num_clips=10, seq_len=2, size=16)
    loader = ClipLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["clips"].shape == (4, 2, 16, 16, 3)
    assert batches[-1]["clips"].shape[0] == 2  # remainder kept
    again = list(loader)
    np.testing.assert_array_equal(batches[0]["clips"], again[0]["clips"])
    loader.set_epoch(1)
    shuffled = list(loader)
    assert not np.array_equal(batches[0]["labels"], shuffled[0]["labels"]) or \
        not np.array_equal(batches[0]["clips"], shuffled[0]["clips"])


def test_transform_presets():
    t = select_transform("299")
    img = np.zeros((64, 64, 3), np.uint8)
    out = t["val"](img)
    assert out.shape == (299, 299, 3)
    assert abs(float(out.mean()) + 1.0) < 1e-5  # zeros -> -1 after norm
    ts = select_transform("shuffle")
    rng = np.random.default_rng(0)
    params = ts["train"].sample_params(rng)
    out = ts["train"](np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3),
                      params)
    assert isinstance(out, tuple) and out[1].shape == (9,)


def test_jpeg_compress_and_patch_shuffle():
    rng0 = np.random.RandomState(0)
    img = rng0.randint(0, 255, (48, 48, 3), dtype=np.uint8)
    lq = jpeg_compress(img, 10)
    assert lq.shape == img.shape
    assert not np.array_equal(lq, img)  # q=10 must distort
    rng = np.random.default_rng(0)
    shuf, perm = shuffle_patches(img, 4, rng)
    assert shuf.shape == img.shape and sorted(perm.tolist()) == list(range(16))


def test_synthetic_dataset_signal():
    ds = SyntheticVideoDataset(num_clips=8, seq_len=4, size=24)
    reals = [ds[i] for i in range(0, 8, 2)]
    fakes = [ds[i] for i in range(1, 8, 2)]
    assert all(r["labels"] == 0 for r in reals)
    assert all(f["labels"] == 1 for f in fakes)
    # fake clips have larger frame-to-frame differences (temporal artifact)
    def tdiff(item):
        c = item["clips"]
        return float(np.abs(c[1:] - c[:-1]).mean())
    assert np.mean([tdiff(f) for f in fakes]) > np.mean([tdiff(r) for r in reals])


def test_mixed_dataset_set_quality(tmp_path):
    root = str(tmp_path)
    _make_ffpp_tree(root)
    ds = MixedVideoDataset(root=root, size=32, seq_len=4,
                           transform=Transform(32))
    n_hq = len(ds)
    ds.set_quality("lq")
    assert len(ds) == n_hq
    assert ds.inner.quality == "lq"


def test_celeb_pair_return(tmp_path):
    root = str(tmp_path)
    rng = np.random.RandomState(0)
    for cls in ("Celeb-real", "Celeb-synthesis"):
        for v in range(2):
            d = os.path.join(root, cls, f"{v}")
            os.makedirs(d, exist_ok=True)
            for f in range(6):
                Image.fromarray(rng.randint(0, 255, (32, 32, 3),
                                            dtype=np.uint8)
                                ).save(os.path.join(d, f"{f:02d}.jpg"))
    ds = Celeb(root=root, size=32, seq_len=4, pair_return=True,
               compress_param=[20], transform=Transform(32))
    item = ds[0]
    assert "clips_lq" in item and item["clips_lq"].shape == item["clips"].shape


def test_collate_mixed_types():
    items = [{"clips": np.zeros((2, 4, 4, 3)), "labels": np.int32(1),
              "paths": ["a", "b"]},
             {"clips": np.ones((2, 4, 4, 3)), "labels": np.int32(0),
              "paths": ["c", "d"]}]
    b = collate(items)
    assert b["clips"].shape == (2, 2, 4, 4, 3)
    assert b["labels"].shape == (2,)
    assert b["paths"] == [["a", "b"], ["c", "d"]]


def test_loader_multihost_slicing():
    """Hosts derive the same global order and take disjoint contiguous
    slices covering each global batch exactly (multi-host decode
    sharding; every host decodes 1/host_count of the work)."""
    from istvt_tpu.data import SyntheticVideoDataset
    from istvt_tpu.data.loader import ClipLoader

    ds = SyntheticVideoDataset(num_clips=24, seq_len=2, size=32, seed=0)
    full = ClipLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                      seed=3)
    parts = [ClipLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                        seed=3, host_count=4, host_index=h)
             for h in range(4)]
    gb = full._index_batches()
    hb = [p._index_batches() for p in parts]
    assert all(len(b) == len(gb) for b in hb)
    for i, g in enumerate(gb):
        got = np.concatenate([hb[h][i] for h in range(4)])
        np.testing.assert_array_equal(got, g)      # exact disjoint cover
        assert all(hb[h][i].size == 2 for h in range(4))


def test_loader_multihost_batch_shapes():
    from istvt_tpu.data import SyntheticVideoDataset
    from istvt_tpu.data.loader import ClipLoader

    ds = SyntheticVideoDataset(num_clips=16, seq_len=2, size=32, seed=0)
    loader = ClipLoader(ds, batch_size=8, shuffle=False, drop_last=True,
                        host_count=2, host_index=1, num_workers=2)
    batch = next(iter(loader))
    assert batch["clips"].shape[0] == 4   # local slice of the global 8


def test_raw_uint8_ingest_matches_f32_after_device_normalize(tmp_path):
    """raw_uint8 Transform + device_normalize must reproduce the host
    f32 normalize path exactly (serving ingest ships 4x fewer bytes)."""
    import jax.numpy as jnp

    from istvt_tpu.data import VideoSeqDataset, device_normalize
    from istvt_tpu.data.transforms import Transform

    root = str(tmp_path)
    _make_ffpp_tree(root, quality=("hq",), videos=1, frames=4, size=40)
    kw = dict(root=root, quality="hq", size=32, mode="Test", seq_len=2)
    ds_f32 = VideoSeqDataset(transform=Transform(32), **kw)
    ds_u8 = VideoSeqDataset(transform=Transform(32, raw_uint8=True), **kw)

    a = ds_f32[0]["clips"]
    b = ds_u8[0]["clips"]
    assert b.dtype == np.uint8 and a.dtype == np.float32
    got = np.asarray(device_normalize(jnp.asarray(b)))
    np.testing.assert_allclose(got, a, atol=1e-6)


def test_static_patch_ground_truth_location():
    """static_patch fakes expose patch_yx and the artifact actually sits
    there (and only there, modulo the global-motion roll)."""
    from istvt_tpu.data import SyntheticVideoDataset

    ds = SyntheticVideoDataset(num_clips=4, seq_len=3, size=64, seed=0,
                               static_patch=True, patch_size=16)
    real, fake = ds[0], ds[1]
    assert tuple(real["patch_yx"]) == (-1, -1)
    y, x = fake["patch_yx"]
    assert 0 <= y <= 48 and 0 <= x <= 48
    d = np.abs(fake["clips"][2]
               - np.roll(fake["clips"][1], 1, axis=1)).sum(axis=-1) > 0
    ys, xs = np.where(d)
    assert y <= ys.min() and ys.max() < y + 16
    assert x <= xs.min() and xs.max() <= x + 16 + 1   # +1: rolled overlap
