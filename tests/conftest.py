"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax import.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count), per SURVEY.md §4(c). Set
ISTVT_TEST_TPU=1 to run the suite on real accelerators instead.
"""
import os
import sys

if not os.environ.get("ISTVT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
        # 8 virtual device threads oversubscribe this host's single core:
        # heavy shard_map bodies (e.g. the pipeline-parallel scan) arrive
        # at collectives minutes apart, and XLA-CPU's rendezvous would
        # abort the whole process after its default 40 s.
        flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
                  " --xla_cpu_collective_call_terminate_timeout_seconds=1800")
    os.environ["XLA_FLAGS"] = flags
    # A sitecustomize may have force-registered an accelerator plugin via
    # jax.config.update("jax_platforms", ...), which overrides the env var —
    # override it back so tests run on the 8-device virtual CPU mesh.
    import jax

    jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE = "/root/reference"

import pytest  # noqa: E402


def has_reference() -> bool:
    return os.path.isdir(REFERENCE)


@pytest.fixture(scope="session")
def reference_path():
    if not has_reference():
        pytest.skip("reference repo not mounted")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    return REFERENCE


# Shared capability-model geometry: tiny depth-2 ISTVT on 3-frame 72^2
# clips with a STATIC 24^2 artifact patch (spatially localizable ground
# truth). Consumed by tests/test_e2e_learning.py (held-out AUC, int8
# parity, LRP localization) and tests/test_distill.py (teacher) —
# session-scoped so the ~90 s training runs once per suite.
E2E_T, E2E_SZ, E2E_PS = 3, 72, 24


@pytest.fixture(scope="session")
def synthetic_trained():
    """(model, params, model_state, train_batches): a trained, BN-
    recalibrated tiny ISTVT on the static-patch synthetic task."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from istvt_tpu.core.config import ISTVTConfig, TrainConfig
    from istvt_tpu.data import SyntheticVideoDataset
    from istvt_tpu.models.registry import model_selection
    from istvt_tpu.train import step as S
    from istvt_tpu.train.schedule import cosine_schedule

    cfg = ISTVTConfig(num_frames=E2E_T, image_size=E2E_SZ, feat_hw=5,
                      depth=2)
    model = model_selection("istvt", num_out_classes=1, cfg=cfg)
    opt = S.make_optimizer(TrainConfig(optimizer="adamw"),
                           cosine_schedule(3e-4, 10_000))
    ts = S.create_train_state(model, jax.random.PRNGKey(0), opt)
    step = S.make_train_step(model, opt, donate=False)

    train_ds = SyntheticVideoDataset(num_clips=24, seq_len=E2E_T,
                                     size=E2E_SZ, seed=0,
                                     static_patch=True, patch_size=E2E_PS)

    def batch_of(idx):
        items = [train_ds[i] for i in idx]
        return {"clips": jnp.asarray(
                    np.stack([it["clips"] for it in items])),
                "labels": jnp.asarray(
                    np.stack([it["labels"] for it in items]))}

    batches = [batch_of(range(i, i + 8)) for i in (0, 8, 16)]
    rng = jax.random.PRNGKey(1)
    first = None
    for _ in range(6):
        for b in batches:
            rng, srng = jax.random.split(rng)
            ts, m = step(ts, b, srng)
            first = first if first is not None else float(m["loss"])
    assert float(m["loss"]) < 0.1 * first, (first, float(m["loss"]))
    mstate = S.recalibrate_bn(model, ts.params, ts.model_state, batches)
    return model, ts.params, mstate, batches
