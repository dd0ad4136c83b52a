"""Raw-video front end: container decode, face crop, RawVideoDataset,
offline extraction (SURVEY.md §2.7.1; reference call site
train_CNN.py:172-173 consumes the output of this stage)."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from istvt_tpu import native
from istvt_tpu.data.video_frontend import (
    RawVideoDataset,
    clip_face_crops,
    decode_clip,
    extract_frames,
    face_box,
    probe,
    scan_ffpp_videos,
)

W, H, NF = 160, 120, 30
SKIN_BGR = (140, 160, 220)  # BGR of a skin-ish RGB (220, 160, 140)


def _write_face_video(path, n=NF, seed=0):
    """A dark scene with a skin-colored ellipse ('face') drifting slowly."""
    rng = np.random.RandomState(seed)
    wtr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (W, H))
    assert wtr.isOpened()
    for t in range(n):
        img = (rng.rand(H, W, 3) * 40).astype(np.uint8)
        cx, cy = 80 + t // 4, 60 + t // 8
        cv2.ellipse(img, (cx, cy), (22, 30), 0, 0, 360, SKIN_BGR, -1)
        wtr.write(img)
    wtr.release()


@pytest.fixture(scope="module")
def video_tree(tmp_path_factory):
    """FF++-layout raw-video tree: root/hq/{original,Deepfakes}/*.mp4."""
    root = tmp_path_factory.mktemp("rawvids")
    for method, seeds in (("original", (0, 1)), ("Deepfakes", (2, 3))):
        d = root / "hq" / method
        d.mkdir(parents=True)
        for s in seeds:
            _write_face_video(str(d / f"vid{s}.mp4"), seed=s)
    return str(root)


def test_probe_and_decode(video_tree):
    path = os.path.join(video_tree, "hq", "original", "vid0.mp4")
    n, w, h, fps = probe(path)
    assert (n, w, h) == (NF, W, H) and fps > 0

    clip = decode_clip(path, [0, 5, 6, 29], out_size=64)
    assert clip.shape == (4, 64, 64, 3) and clip.dtype == np.float32
    assert np.isfinite(clip).all()
    # normalized (x/255 - .5)/.5 stays in [-1, 1]
    assert clip.min() >= -1.001 and clip.max() <= 1.001
    # distinct frames decoded (the ellipse moves)
    assert np.abs(clip[0] - clip[3]).max() > 0.05


def test_native_and_cv2_paths_agree(video_tree):
    if not native.video_available():
        pytest.skip("native videodecode unavailable")
    path = os.path.join(video_tree, "hq", "original", "vid0.mp4")
    a = decode_clip(path, [2, 10], out_size=64, use_native=True)
    b = decode_clip(path, [2, 10], out_size=64, use_native=False)
    # same frames, same normalization; scalers differ in filter phase only
    assert np.abs(a - b).mean() < 0.03


def test_face_box_finds_skin_ellipse(video_tree):
    path = os.path.join(video_tree, "hq", "original", "vid0.mp4")
    frame = decode_clip(path, [0], out_size=120)[0]
    y0, x0, bh, bw = face_box(frame, margin=1.3, mode="skin")
    assert bh == bw > 0
    # frame 0's ellipse center maps to (60, 80)*(120/W, 120/H) scaled —
    # decode squashes W->120: center ~ (60, 60) in the 120x120 frame
    cy, cx = y0 + bh / 2, x0 + bw / 2
    assert abs(cy - 60) < 25 and abs(cx - 60) < 25, (cy, cx)
    # crop tighter than the full frame (it localized SOMETHING)
    assert bh < 120


def test_face_box_center_fallback():
    flat = np.zeros((100, 160, 3), np.uint8)  # no skin pixels anywhere
    y0, x0, bh, bw = face_box(flat, mode="skin")
    assert (y0, x0, bh, bw) == (0, 30, 100, 100)  # centered short side


def test_clip_face_crops_stable_box(video_tree):
    path = os.path.join(video_tree, "hq", "original", "vid0.mp4")
    crops = clip_face_crops(path, [0, 1, 2, 3], margin=1.3, mode="skin")
    assert crops.shape == (4, 4)
    # one box for the whole clip (temporally stable crop)
    assert (crops == crops[0]).all()
    clip = decode_clip(path, [0, 1, 2, 3], out_size=72, crops=crops)
    assert clip.shape == (4, 72, 72, 3) and np.isfinite(clip).all()


def test_raw_video_dataset(video_tree):
    ds = RawVideoDataset(video_tree, quality="hq", seq_len=4, size=72,
                         mode="Train", return_fake_type=True, seed=0)
    assert len(ds) == 4
    labels = set()
    for i in range(len(ds)):
        item = ds[i]
        assert item["clips"].shape == (4, 72, 72, 3)
        assert np.isfinite(item["clips"]).all()
        labels.add(int(item["labels"]))
    assert labels == {0, 1}

    # loader integration: one collated batch
    from istvt_tpu.data.loader import ClipLoader
    loader = ClipLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    batch = next(iter(loader))
    assert batch["clips"].shape == (4, 4, 72, 72, 3)
    assert batch["labels"].shape == (4,)


def test_extract_frames_to_data_layout(video_tree, tmp_path):
    """extract_frames + preprocess CLI produce the docs/DATA.md layout
    that VideoSeqDataset consumes."""
    from istvt_tpu.cli.preprocess import main as preprocess_main
    from istvt_tpu.data import VideoSeqDataset

    out = tmp_path / "frames"
    rc = preprocess_main(["--root", video_tree, "--out", str(out),
                          "--quality", "hq", "--every-n", "3",
                          "--size", "96", "--workers", "2"])
    assert rc == 0
    # layout: out/hq/<method>/<video>/0000.jpg ...
    vid_dir = out / "hq" / "original" / "vid0"
    frames = sorted(os.listdir(vid_dir))
    assert len(frames) == NF // 3 and frames[0] == "0000.jpg"

    ds = VideoSeqDataset(root=str(out), quality="hq", seq_len=4, size=96,
                         mode="Test")
    assert len(ds) == 4
    item = ds[0]
    assert item["clips"].shape == (4, 96, 96, 3)
    assert np.isfinite(item["clips"]).all()


def test_crop_exactness_native(video_tree):
    """A crop whose size equals out_size must round-trip bit-near-exactly
    through the native path (no resample)."""
    if not native.video_available():
        pytest.skip("native videodecode unavailable")
    path = os.path.join(video_tree, "hq", "original", "vid0.mp4")
    crops = np.asarray([[10, 20, 64, 64]], np.int32)
    a = decode_clip(path, [0], out_size=64, crops=crops, use_native=True)
    b = decode_clip(path, [0], out_size=64, crops=crops, use_native=False)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_decode_clip_unsorted_indices_align_crops(video_tree):
    """Crops must follow their indices and output rows must come back in
    the order given, even when indices arrive unsorted (review r2)."""
    path = os.path.join(video_tree, "hq", "original", "vid0.mp4")
    crops = np.asarray([[0, 0, 64, 64], [40, 80, 64, 64]], np.int32)
    a = decode_clip(path, [20, 3], out_size=48, crops=crops)
    b0 = decode_clip(path, [3], out_size=48,
                     crops=crops[1:2])  # crop for index 3
    b1 = decode_clip(path, [20], out_size=48, crops=crops[0:1])
    np.testing.assert_allclose(a[0], b1[0], atol=1e-6)
    np.testing.assert_allclose(a[1], b0[0], atol=1e-6)


def test_extract_frames_redetects_moving_face(tmp_path):
    """Per-chunk face re-localization must track a subject that moves
    across the frame (review r2: one whole-video box drifts off-face)."""
    import cv2 as _cv2
    p = str(tmp_path / "move.mp4")
    wtr = _cv2.VideoWriter(p, _cv2.VideoWriter_fourcc(*"mp4v"), 25,
                           (W, H))
    n = 40
    for t in range(n):
        img = np.zeros((H, W, 3), np.uint8)
        cx = 25 + int((W - 50) * t / (n - 1))   # sweeps left -> right
        _cv2.ellipse(img, (cx, 60), (18, 24), 0, 0, 360, SKIN_BGR, -1)
        wtr.write(img)
    wtr.release()
    out = tmp_path / "frames"
    wrote = extract_frames(p, str(out), every_n=1, size=64,
                           redetect_every=8)
    assert wrote == n
    # first and last frames must both contain substantial skin pixels
    # (a single mid-video box would miss at least one end)
    from PIL import Image
    for name in ("0000.jpg", f"{n-1:04d}.jpg"):
        img = np.asarray(Image.open(out / name).convert("RGB"), np.float32)
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        skin = (r > 150) & (g > 100) & (b > 80) & (r > b)
        assert skin.mean() > 0.10, (name, skin.mean())


def test_train_cli_from_raw_videos(video_tree, tmp_path):
    """VERDICT r1 #6 'Done': the train CLI runs end to end from a
    directory of .mp4s (-d ff++video), one tiny epoch."""
    from istvt_tpu.cli.train import main as train_main

    # batch 8: the CLI shards the batch over all (8 virtual) devices
    train_main([
        "-mn", "istvt", "-d", "ff++video", "--data_root", video_tree,
        "-q", "hq", "-sl", "2", "-is", "72", "-bs", "8", "-e", "1",
        "--depth", "1", "--num_workers", "2", "--dataset_len", "8",
        "--checkpoint_dir", str(tmp_path / "out"),
    ])
    import os as _os
    assert _os.path.isdir(tmp_path / "out")


# ---------------------------------------------------------------------------
# Crop-fidelity validation vs synthetic ground truth (VERDICT r2 #9).
# No face-detector data ships in this environment (cv2 has no Haar
# cascades, zero egress), so fidelity is quantified against KNOWN
# ground-truth boxes: skin-tone ellipses at controlled positions/sizes on
# non-skin backgrounds across the aspect ratios FF++ videos actually use.
# Thresholds pinned ~0.05 under measured (direct 0.80/0.78 mean/min,
# probe-mapped 0.80/0.77); numbers documented in docs/DATA.md.


def _synth_face_frame(h, w, cy, cx, fh, fw, seed):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.float32)
    img[..., 0] = 0.3
    img[..., 1] = 0.4
    img[..., 2] = 0.55
    img += rng.normal(0, 0.05, img.shape)
    yy, xx = np.mgrid[0:h, 0:w]
    ell = (((yy - cy) / (fh / 2)) ** 2 + ((xx - cx) / (fw / 2)) ** 2) <= 1
    img[ell] = np.array([0.78, 0.57, 0.45]) \
        + rng.normal(0, 0.03, (int(ell.sum()), 3))
    return np.clip(img, 0, 1)


def _iou(a, b):
    ay, ax, ah, aw = a
    by, bx, bh, bw = b
    y1, x1 = max(ay, by), max(ax, bx)
    y2, x2 = min(ay + ah, by + bh), min(ax + aw, bx + bw)
    inter = max(0, y2 - y1) * max(0, x2 - x1)
    return inter / (ah * aw + bh * bw - inter)


def _truth_box(h, w, cy, cx, fh, fw, margin):
    side = int(min(max(max(fh, fw) * margin, 16), min(h, w)))
    y0 = int(np.clip(cy - side / 2, 0, h - side))
    x0 = int(np.clip(cx - side / 2, 0, w - side))
    return y0, x0, side, side


def test_face_box_iou_vs_ground_truth():
    """face_box on full-res frames: IoU vs the ideal margin-grown square
    around a known face ellipse, swept over sizes/positions/aspects."""
    ious = []
    for trial in range(24):
        h, w = [(240, 320), (480, 640), (360, 640), (300, 300)][trial % 4]
        rng = np.random.default_rng(trial)
        fh = int(min(h, w) * rng.uniform(0.3, 0.5))
        fw = int(fh * rng.uniform(0.75, 0.95))
        cy = rng.uniform(fh / 2 + 5, h - fh / 2 - 5)
        cx = rng.uniform(fw / 2 + 5, w - fw / 2 - 5)
        frame = _synth_face_frame(h, w, cy, cx, fh, fw, trial)
        got = face_box(frame, margin=1.3, mode="skin")
        ious.append(_iou(got, _truth_box(h, w, cy, cx, fh, fw, 1.3)))
    ious = np.asarray(ious)
    assert ious.mean() > 0.75, ious
    assert ious.min() > 0.70, ious


def test_detect_box_probe_mapping_iou():
    """_detect_box's aspect-squashed-probe -> source mapping: the raw
    probe bbox must map extent-by-extent, square ONLY in source pixels,
    and keep the full-res path's fidelity (a probe-squared box mis-sizes
    by up to w/h: measured IoU 0.35 before the fix, 0.80 after)."""
    import cv2 as _cv2
    from istvt_tpu.data.video_frontend import _detect_box

    ious = []
    for trial in range(24):
        h, w = [(240, 320), (480, 640), (360, 640), (404, 720)][trial % 4]
        rng = np.random.default_rng(100 + trial)
        fh = int(min(h, w) * rng.uniform(0.3, 0.5))
        fw = int(fh * rng.uniform(0.75, 0.95))
        cy = rng.uniform(fh / 2 + 5, h - fh / 2 - 5)
        cx = rng.uniform(fw / 2 + 5, w - fw / 2 - 5)
        frame = _synth_face_frame(h, w, cy, cx, fh, fw, 100 + trial)
        # decode_clip's probe convention: square resize + (x-0.5)/0.5
        small = _cv2.resize(frame, (128, 128),
                            interpolation=_cv2.INTER_AREA) * 2 - 1
        got = _detect_box("(unused)", 0, (h, w), margin=1.3, mode="skin",
                          probe_size=128, use_native=False, small=small)
        assert got[2] == got[3], got  # square in SOURCE pixels
        ious.append(_iou(got, _truth_box(h, w, cy, cx, fh, fw, 1.3)))
    ious = np.asarray(ious)
    assert ious.mean() > 0.75, ious
    assert ious.min() > 0.70, ious


# ---------------------------------------------------------------------------
# External crop-box ingestion (VERDICT r4 #6): real-data users plug
# dlib/MTCNN output in as a JSON manifest; covered videos must use those
# boxes EXACTLY, uncovered ones keep the in-tree localizer.


def test_box_manifest_exact_honoring(video_tree, tmp_path):
    import json

    from istvt_tpu.data.video_frontend import BoxManifest

    path = os.path.join(video_tree, "hq", "original", "vid0.mp4")
    man = {"vid0": {"0": [10, 20, 64, 64], "8": [12, 24, 64, 64]}}
    mf_path = tmp_path / "boxes.json"
    mf_path.write_text(json.dumps(man))
    bm = BoxManifest(str(mf_path))

    crops = clip_face_crops(path, [0, 3, 8, 9], boxes=bm)
    expect = np.asarray([[10, 20, 64, 64],    # frame 0: annotated, exact
                         [10, 20, 64, 64],    # frame 3: nearest (0)
                         [12, 24, 64, 64],    # frame 8: annotated, exact
                         [12, 24, 64, 64]],   # frame 9: nearest (8)
                        np.int32)
    np.testing.assert_array_equal(crops, expect)
    # and the decode consumes them verbatim
    a = decode_clip(path, [0, 3, 8, 9], 48, crops=crops)
    b = decode_clip(path, [0, 3, 8, 9], 48, crops=expect)
    np.testing.assert_allclose(a, b, atol=1e-7)

    # dict source + stem/basename/path key matching all resolve
    bm2 = BoxManifest(man)
    assert bm2.lookup(path) is not None
    assert BoxManifest({"vid0.mp4": man["vid0"]}).lookup(path)
    assert BoxManifest({path: man["vid0"]}).lookup(path)
    # uncovered video: None -> caller falls back to the localizer
    other = os.path.join(video_tree, "hq", "original", "vid1.mp4")
    assert bm.boxes_for(other, [0]) is None
    fall = clip_face_crops(other, [0, 1], boxes=bm)
    np.testing.assert_array_equal(
        fall, clip_face_crops(other, [0, 1]))


def test_raw_video_dataset_honors_external_boxes(video_tree):
    from istvt_tpu.data.video_frontend import BoxManifest

    box = [14, 30, 70, 70]
    man = {"vid0": {"0": box}}
    ds = RawVideoDataset(video_tree, quality="hq", seq_len=4, size=72,
                         mode="Test", boxes=man)   # dict accepted too
    assert isinstance(ds.boxes, BoxManifest)
    i = next(i for i, e in enumerate(ds.entries)
             if e["path"].endswith("vid0.mp4"))
    item = ds[i]
    # deterministic Test-mode indices: centered span
    start = (NF - 4) // 2
    idxs = list(range(start, start + 4))
    expect = decode_clip(ds.entries[i]["path"], idxs, 72,
                         crops=np.tile(np.asarray(box, np.int32), (4, 1)))
    np.testing.assert_allclose(item["clips"], expect, atol=1e-7)


def test_extract_frames_honors_per_frame_boxes(video_tree, tmp_path):
    from PIL import Image

    from istvt_tpu.data.video_frontend import BoxManifest

    path = os.path.join(video_tree, "hq", "original", "vid0.mp4")
    boxA, boxB = [0, 0, 60, 60], [40, 80, 60, 60]
    bm = BoxManifest({"vid0": {"0": boxA, "2": boxB}})
    out = tmp_path / "frames"
    wrote = extract_frames(path, str(out), every_n=1, size=64, limit=4,
                           boxes=bm)
    assert wrote == 4
    # frames 0,1 -> boxA (1 ties to 0, first-nearest wins); 2,3 -> boxB
    crops = np.asarray([boxA, boxA, boxB, boxB], np.int32)
    expect = decode_clip(path, [0, 1, 2, 3], 64, crops=crops,
                         mean=0.0, std=1.0 / 255.0)
    for i in range(4):
        got = np.asarray(Image.open(out / f"{i:04d}.jpg").convert("RGB"),
                         np.float32)
        ref = np.clip(expect[i], 0, 255)
        assert np.abs(got - ref).mean() < 4.0, i  # JPEG q95 tolerance


def test_preprocess_cli_boxes_flag(video_tree, tmp_path):
    import json

    from istvt_tpu.cli.preprocess import main as preprocess_main

    mf_path = tmp_path / "boxes.json"
    mf_path.write_text(json.dumps(
        {f"vid{s}": {"0": [8, 16, 72, 72]} for s in range(4)}))
    out = tmp_path / "frames"
    rc = preprocess_main(["--root", video_tree, "--out", str(out),
                          "--quality", "hq", "--every-n", "10",
                          "--size", "64", "--workers", "2",
                          "--boxes", str(mf_path)])
    assert rc == 0
    assert sorted(os.listdir(out / "hq" / "original" / "vid0")) == \
        ["0000.jpg", "0001.jpg", "0002.jpg"]
