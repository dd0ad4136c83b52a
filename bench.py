"""Throughput benchmark — prints ONE JSON line for the driver.

Measures ISTVT forward throughput (6-frame 300x300 clips/sec) on the
available accelerator, the generalization of the reference's timing
harness (reference test_time.py:1-9: 10k bs=1 forwards, wall-clock avg).

Baseline: BASELINE.md targets >=5,000 clips/sec aggregate on a v5e-8
slice, i.e. 625 clips/sec/chip — `vs_baseline` is measured
clips/sec/chip divided by 625.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

PER_CHIP_BASELINE = 5000.0 / 8.0


def main():
    from istvt_tpu.core.config import ISTVTConfig
    from istvt_tpu.models import istvt

    cfg = ISTVTConfig()
    rng = jax.random.PRNGKey(0)
    params, state = istvt.init(rng, cfg)

    platform = jax.devices()[0].platform
    # batch size: saturate the MXU on TPU; stay small on CPU fallback
    batch = int(os.environ.get("BENCH_BATCH", "8" if platform == "tpu" else "1"))
    iters = int(os.environ.get("BENCH_ITERS", "20" if platform == "tpu" else "2"))
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32

    def fwd(params, state, clips):
        logits, _ = istvt.apply(params, state, clips, cfg, train=False)
        return logits

    from functools import partial

    @partial(jax.jit, static_argnums=(3,))
    def timed_loop(params, state, clips, n):
        """n chained forwards in ONE device program: each iteration's input
        is perturbed by the previous logits, so no two executions can be
        deduplicated or overlapped dishonestly."""
        def body(c, _):
            logits = fwd(params, state, c)
            c = c + (jnp.mean(logits) * 1e-6).astype(c.dtype)
            return c, jnp.sum(logits)
        c, sums = jax.lax.scan(body, clips, None, length=n)
        return sums

    clips = jax.random.normal(
        jax.random.PRNGKey(1),
        (batch, cfg.num_frames, cfg.image_size, cfg.image_size, 3),
        dtype)

    # warmup / compile. NOTE: the timed call must differ from the warmup
    # call — some remote execution backends replay cached results for
    # byte-identical requests, which would fake the measurement.
    jax.block_until_ready(timed_loop(params, state, clips, iters))
    t0 = time.perf_counter()
    out = timed_loop(params, state, clips + 1.0, iters)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    clips_per_sec = batch * iters / dt
    p50_latency_ms = dt / iters * 1000.0 / batch
    result = {
        "metric": "istvt_fwd_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / PER_CHIP_BASELINE, 4),
        "extra": {
            "platform": platform,
            "batch": batch,
            "iters": iters,
            "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
            "per_clip_ms": round(p50_latency_ms, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
