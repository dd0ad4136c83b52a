"""Compat/aux tools: parity harness, ClassBlock, Kinetics dataset,
checkpoint roundtrip."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from istvt_tpu.compat.parity import compare_stages, format_report
from istvt_tpu.models.xception import class_block_apply, class_block_init


def test_compare_stages_catches_divergence():
    stages_a = [("double", lambda x: x * 2), ("add", lambda x: x + 1)]
    stages_b = [("double", lambda x: x * 2), ("add", lambda x: x + 1.5)]
    x = np.ones((2, 3), np.float32)
    reports = compare_stages(stages_a, stages_b, x, x)
    assert reports[0].ok
    assert not reports[1].ok
    assert "FAIL" in format_report(reports)


def test_class_block():
    p = class_block_init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(4, 2048), jnp.float32)
    out = class_block_apply(p, x, train=False)
    assert out.shape == (4, 1)
    assert bool(jnp.isfinite(out).all())


def test_kinetics_dataset(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image
    from istvt_tpu.data.kinetics import Kinetics

    rng = np.random.RandomState(0)
    frames = []
    d = tmp_path / "frames" / "jumping" / "abc_000001_000011"
    os.makedirs(d)
    for i in range(6):
        path = str(d / f"{i:04d}.jpg")
        Image.fromarray(rng.randint(0, 255, (64, 64, 3),
                                    dtype=np.uint8)).save(path)
        frames.append(path)
    ann = {"labels": ["jumping"],
           "train_data": [{"frames": frames, "label": 0}],
           "val_data": [{"frames": frames, "label": 0}]}
    ds = Kinetics(str(tmp_path), split="train", clip_len=4, size=32,
                  annotations=ann)
    item = ds[0]
    assert item["clips"].shape == (4, 32, 32, 3)
    assert item["labels"] == 0
    ds3 = Kinetics(str(tmp_path), split="3crop", clip_len=4, size=32,
                   annotations=ann)
    assert ds3[0]["clips"].shape == (3, 4, 32, 32, 3)


def test_checkpoint_roundtrip(tmp_path):
    from istvt_tpu.core.checkpoint import load_pytree, save_pytree

    tree = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            "b": {"c": jnp.ones((4,))}}
    path = str(tmp_path / "ckpt")
    save_pytree(path, tree)
    restored = load_pytree(path, tree)
    np.testing.assert_array_equal(np.asarray(restored["a"]),
                                  np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(restored["b"]["c"]),
                                  np.asarray(tree["b"]["c"]))


def test_checkpoint_manager_best_tracking(tmp_path):
    from istvt_tpu.core.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "mgr"), max_to_keep=3)
    state = {"w": jnp.zeros((2,))}
    mgr.save(1, state, metric=0.5)
    mgr.save(2, {"w": jnp.ones((2,))}, metric=0.9)
    mgr.save(3, {"w": 2 * jnp.ones((2,))}, metric=0.7)
    assert mgr.latest_step() == 3
    assert mgr.best_step() == 2
    restored = mgr.restore(2, template=state)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.ones(2))
    mgr.close()


def test_checkpoint_manager_async_save(tmp_path):
    """async_save returns before commit; wait()/restore() block on it and
    the state round-trips exactly (the Trainer's epoch-save mode)."""
    from istvt_tpu.core.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "amgr"), async_save=True)
    state = {"w": jnp.arange(4, dtype=jnp.float32)}
    mgr.save(1, state, metric=0.1)
    mgr.save(2, {"w": 2 * jnp.arange(4, dtype=jnp.float32)}, metric=0.9)
    mgr.wait()
    assert mgr.latest_step() == 2
    restored = mgr.restore(template=state)
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  2 * np.arange(4, dtype=np.float32))
    # per-call override (signal-handler path): wait=True commits eagerly
    mgr.save(3, state, metric=0.2, wait=True)
    assert mgr.latest_step() == 3
    assert mgr.best_step() == 2
    mgr.close()


def test_vivit_and_vanilla_tr_baselines():
    from istvt_tpu.core.config import ISTVTConfig
    from istvt_tpu.models.registry import model_selection

    cfg = ISTVTConfig(num_frames=2, image_size=72, feat_hw=5, depth=1)
    for name in ("vivit", "vanilla_tr"):
        m = model_selection(name, num_out_classes=1, cfg=cfg)
        p, s = m.init(jax.random.PRNGKey(0))
        out, _ = m.apply(p, s, jnp.zeros((1, 2, 72, 72, 3)), train=False)
        assert out.shape == (1, 1), name
