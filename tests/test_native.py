"""Native clipdecode (C++ libjpeg/libpng decoder) tests."""
import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from istvt_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def _write(path, arr, fmt):
    Image.fromarray(arr).save(path, format=fmt)


def test_decode_png_exact_when_no_resize(tmp_path, lib_ok):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
    p = str(tmp_path / "f.png")
    _write(p, arr, "PNG")
    out = native.decode_frames([p], 32)
    want = (arr.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out[0], want, atol=1e-5)


def test_decode_jpeg_close(tmp_path, lib_ok):
    rng = np.random.RandomState(1)
    # smooth image so JPEG loss is small
    base = np.linspace(0, 255, 32, dtype=np.float32)
    arr = np.broadcast_to(base[None, :, None], (32, 32, 3)).astype(np.uint8)
    p = str(tmp_path / "f.jpg")
    Image.fromarray(arr).save(p, format="JPEG", quality=95)
    out = native.decode_frames([p], 32)
    dec = np.asarray(Image.open(p).convert("RGB"))
    want = (dec.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out[0], want, atol=2e-2)


def test_decode_with_resize_and_threads(tmp_path, lib_ok):
    rng = np.random.RandomState(2)
    paths = []
    for i in range(6):
        arr = rng.randint(0, 255, (48, 40, 3), dtype=np.uint8)
        p = str(tmp_path / f"{i}.png")
        _write(p, arr, "PNG")
        paths.append(p)
    out = native.decode_frames(paths, 32, n_threads=4)
    assert out.shape == (6, 32, 32, 3)
    assert np.isfinite(out).all()
    assert out.min() >= -1.001 and out.max() <= 1.001


def test_missing_file_zeroed(tmp_path, lib_ok):
    with pytest.warns(UserWarning):
        out = native.decode_frames([str(tmp_path / "nope.png")], 16)
    assert np.abs(out).max() == 0.0


def test_dataset_native_path_matches_pil(tmp_path, lib_ok):
    from istvt_tpu.data import Transform, VideoSeqDataset
    d = tmp_path / "hq" / "original" / "000"
    os.makedirs(d)
    rng = np.random.RandomState(3)
    for f in range(4):
        _write(str(d / f"{f:03d}.png"),
               rng.randint(0, 255, (32, 32, 3), dtype=np.uint8), "PNG")
    ds = VideoSeqDataset(root=str(tmp_path), quality="hq", size=32,
                         seq_len=4, mode="Test", transform=Transform(32),
                         use_native=True)
    item = ds[0]
    # no resize (32 -> 32): native path must equal the PIL path exactly
    frames = []
    for p in ds._pick_clip(ds.entries[0], ds._rng(0)):
        from istvt_tpu.data.video_dataset import _load_frame
        frames.append(ds.transform(_load_frame(p)))
    np.testing.assert_allclose(item["clips"], np.stack(frames), atol=1e-5)
