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
    from istvt_tpu.core import tree as tree_util
    from istvt_tpu.core.platform import enable_compilation_cache
    from istvt_tpu.models import istvt

    enable_compilation_cache()

    platform = jax.devices()[0].platform
    # batch size: saturate the MXU on TPU; stay small on CPU fallback
    # B=32 measured faster per clip than 16 (3.29 vs 3.37 ms int8) —
    # fixed per-kernel overheads amortize further
    batch = int(os.environ.get("BENCH_BATCH", "32" if platform == "tpu" else "1"))
    # 32 chained iterations: the per-CALL fixed cost (tunnel round trip +
    # dispatch, measured ~33 ms — see BASELINE.md bs=1 note) amortizes to
    # ~1 ms/iter; device time per batch is what remains
    iters = int(os.environ.get("BENCH_ITERS", "32" if platform == "tpu" else "2"))
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    # The PRODUCTION serving path is int8 W8A8 on the ST-layer GEMMs
    # (kernels/quant.py) — it is the default measurement here, like it
    # would be in deployment: accuracy deltas are asserted by
    # tests/test_quant.py (logits <=5e-2, synthetic AUC delta <0.02) and
    # documented in BASELINE.md. BENCH_DTYPE=bf16 measures the float
    # path. TPU-only either way: off-TPU the q8 kernels never engage
    # (use_pallas gates them), so the flag is ignored there.
    quant = os.environ.get("BENCH_DTYPE", "int8") == "int8" \
        and platform == "tpu"

    cfg = ISTVTConfig(use_pallas=platform == "tpu",
                      quantize="int8" if quant else "none")
    rng = jax.random.PRNGKey(0)
    params, state = istvt.init(rng, cfg)
    if platform == "tpu":
        params = tree_util.cast(params, jnp.bfloat16)
    if quant:
        params = istvt.quantize_params(params)

    @jax.jit
    def fwd_n(params, state, clips, n):
        """n chained forwards in ONE device program: every iteration sees
        a DIFFERENT input (i-dependent perturbation) and the returned
        scalar data-depends on every iteration's logits, so nothing can
        be replay-cached or skipped; the tunnel round trip is paid once."""
        def body(i, acc):
            x = clips + 0.01 * (i + 1).astype(clips.dtype)
            logits, _ = istvt.apply(params, state, x, cfg, train=False)
            return acc + jnp.sum(logits.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    clips = jax.random.normal(
        jax.random.PRNGKey(1),
        (batch, cfg.num_frames, cfg.image_size, cfg.image_size, 3),
        dtype)

    # NOTES on honest measurement under remote-tunnel backends:
    # (a) every timed call uses a DIFFERENT input -- byte-identical requests
    # can be replay-cached; (b) block_until_ready may return before remote
    # execution finishes, so the timed region ends by FETCHING a scalar
    # that data-depends on EVERY iteration's output (the running sum) --
    # nothing can be skipped; (c) iterations are chained WITHOUT
    # intermediate fetches so the ~tens-of-ms tunnel round trip is paid
    # once, not per iteration (it is host overhead, not device time).
    # run-specific salt so the timed request is never byte-identical to a
    # previous bench invocation (the tunnel replay-caches identical
    # requests)
    salt = jnp.asarray((time.time() % 997) / 1e4, dtype)
    clips = clips + salt
    float(fwd_n(params, state, clips, 1))  # compile + warmup
    t0 = time.perf_counter()
    float(fwd_n(params, state, clips, iters))
    dt = (time.perf_counter() - t0) / iters

    clips_per_sec = batch / dt
    per_clip_ms = dt * 1000.0 / batch   # MEAN over the chained iterations

    # true single-clip p50 latency (BASELINE.md tracks it separately from
    # batched throughput)
    lat_ms = dev_ms = None
    if os.environ.get("BENCH_LATENCY", "1") == "1" and batch > 1:
        # ONE bs=1 program serves both measurements (each distinct shape
        # costs a full ~60-150s remote compile): p50 = median of single
        # calls (includes the tunnel round trip, what a caller sees);
        # device_ms = 16 chained forwards in one call, so the fixed cost
        # is paid once — p50 minus device_ms is transport, not compute.
        clip1 = clips[:1]
        float(fwd_n(params, state, clip1, 1))  # compile + warm
        lat = []
        for i in range(5):
            t0 = time.perf_counter()
            float(fwd_n(params, state, clip1 + 0.01 * (i + 1), 1))
            lat.append(time.perf_counter() - t0)
        lat.sort()
        lat_ms = lat[len(lat) // 2] * 1000.0
        t0 = time.perf_counter()
        float(fwd_n(params, state, clip1, 16))
        dev_ms = (time.perf_counter() - t0) / 16 * 1000.0
    result = {
        "metric": "istvt_fwd_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / PER_CHIP_BASELINE, 4),
        "extra": {
            "platform": platform,
            "batch": batch,
            "iters": iters,
            "dtype": "int8_w8a8" if quant else
                     str(dtype.__name__ if hasattr(dtype, "__name__")
                         else dtype),
            "per_clip_ms": round(per_clip_ms, 3),
        },
    }
    if lat_ms is not None:
        result["extra"]["p50_latency_ms_bs1"] = round(lat_ms, 2)
    if dev_ms is not None:
        result["extra"]["device_ms_bs1"] = round(dev_ms, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
