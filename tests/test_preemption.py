"""SIGTERM preemption checkpointing + resume (VERDICT r4 #4).

The trainer installs a SIGTERM/SIGINT handler during fit()
(train/trainer.py `_save_and_exit`) that snapshots the FULL train state
(params + BN stats + optimizer + step) before exiting, so a preempted
run loses at most the in-flight step. `--continue_train` must then
resume from exactly the saved step. Reference restartability contract:
train_CNN.py:182-183,1026-1027 (manual resume from per-epoch pickles —
a mid-epoch kill there loses the whole epoch; ours must not).

Runs the real CLI in a subprocess (signals cannot be tested in-process:
pytest owns the main thread's handlers) on a single virtual CPU device.
"""
import os
import signal
import subprocess
import sys
import threading
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARGS = ["-mn", "istvt", "-d", "synthetic", "-is", "72", "-sl", "3",
        "--depth", "1", "-bs", "4", "--dataset_len", "8", "--lr", "1e-4"]


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # one device: the conftest's 8-device flags would make the mesh's
    # data axis 8 and reject the 4-clip batches
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    return env


def test_sigterm_checkpoints_and_resumes(tmp_path):
    ck = str(tmp_path / "ck")
    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "istvt_tpu.cli.train", *ARGS,
         "-e", "500", "-o", ck],
        cwd=REPO, env=_env(), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    # watchdog: readline() below blocks, so a hung trainer is killed from
    # a timer thread rather than hanging the suite
    watchdog = threading.Timer(600.0, proc.kill)
    watchdog.start()
    lines, reached = [], False
    try:
        for line in proc.stdout:
            lines.append(line)
            if line.startswith("epoch 1:") and "val" in line:
                reached = True
                break
        assert reached, "trainer died before epoch 1:\n" + "".join(lines)
        # mid-epoch-2 preemption: the handler must snapshot a step no
        # epoch-end save has seen (or tolerate the same-step collision)
        time.sleep(0.5)
        proc.send_signal(signal.SIGTERM)
        tail, _ = proc.communicate(timeout=300)
        lines.append(tail)
    finally:
        watchdog.cancel()
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    out = "".join(lines)
    assert proc.returncode == 128 + signal.SIGTERM, (proc.returncode, out)
    assert "checkpointing step" in out, out

    from istvt_tpu.core.checkpoint import CheckpointManager
    saved = CheckpointManager(ck).latest_step()
    # epoch 0 ended at step 2 (8 clips / bs 4); the handler must have
    # committed a resumable state at or past the epoch-1 boundary
    assert saved is not None and saved >= 4, (saved, out)

    r = subprocess.run(
        [sys.executable, "-m", "istvt_tpu.cli.train", *ARGS,
         "-e", "1", "-o", ck, "--continue_train"],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert f"resumed from step {saved}" in r.stdout, r.stdout
