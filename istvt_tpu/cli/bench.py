"""Per-model latency/throughput bench — `python -m istvt_tpu.cli.bench`.

Generalization of the reference timing harness (reference test_time.py:1-9:
10k bs=1 DualNet forwards, wall-clock average) to any registry model,
with honest remote-backend measurement (distinct inputs, host fetch).
"""
from __future__ import annotations

import argparse
import json
import statistics
import time


def build_parser():
    p = argparse.ArgumentParser("istvt_tpu.bench")
    p.add_argument("--model_name", "-mn", default="istvt")
    p.add_argument("--batch_size", "-bs", type=int, default=1)
    p.add_argument("--input_size", "-is", type=int, default=300)
    p.add_argument("--seq_len", "-sl", type=int, default=6)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--train_step", action="store_true",
                   help="bench the full train step instead of forward")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="gradient-accumulation microbatches (train_step)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize ST layers + stem (train_step)")
    return p


# registry keys taking (B, T, H, W, 3) clips instead of (B, H, W, 3) images
CLIP_MODELS = ("istvt", "resnet_3d", "vivit", "vanilla_tr", "i3d",
               "resnet3d")


def main(argv=None):
    args = build_parser().parse_args(argv)

    from istvt_tpu.core.platform import honor_env
    honor_env()

    import jax
    import jax.numpy as jnp
    from istvt_tpu.core import tree as tree_util
    from istvt_tpu.core.config import ISTVTConfig, TrainConfig
    from istvt_tpu.models.registry import model_selection

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    is_clip = any(args.model_name.startswith(k) for k in CLIP_MODELS)

    feat_hw = {300: 19, 299: 19, 256: 16, 75: 5, 72: 5}.get(
        args.input_size, max(args.input_size // 16, 2))
    kw = {}
    if args.model_name in ("istvt", "resnet_3d", "vivit", "vanilla_tr"):
        kw["cfg"] = ISTVTConfig(num_frames=args.seq_len,
                                image_size=args.input_size,
                                feat_hw=feat_hw,
                                use_pallas=platform == "tpu",
                                remat=args.remat)
    model = model_selection(args.model_name, num_out_classes=1, **kw)
    params, state = model.init(jax.random.PRNGKey(0))
    if platform == "tpu":
        params = tree_util.cast(params, jnp.bfloat16)

    shape = (args.batch_size, args.seq_len, args.input_size,
             args.input_size, 3) if is_clip else \
        (args.batch_size, args.input_size, args.input_size, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), shape, dtype)

    if args.train_step:
        from istvt_tpu.train import step as S
        from istvt_tpu.train.schedule import cosine_schedule
        opt = S.make_optimizer(TrainConfig(), cosine_schedule(1e-4, 1000))
        ts = S.create_train_state(model, jax.random.PRNGKey(0), opt)
        # donate like the real Trainer (undonated TrainState copies cost
        # ~2x at this size); steps chain through ts, so fetching the last
        # loss blocks on the whole sequence — per-call times stay honest
        # without paying the remote-tunnel fetch per step
        step_fn = S.make_train_step(
            model, opt, donate=True,
            compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16"
            else None,
            grad_accum=args.grad_accum)
        key = "clips" if is_clip else "images"
        xf = x.astype(jnp.float32)
        state_box = {"ts": ts}

        labels = jnp.zeros((args.batch_size,), jnp.int32)

        def dispatch(i):
            b = {key: xf + 0.01 * i, "labels": labels}
            state_box["ts"], m = step_fn(state_box["ts"], b,
                                         jax.random.PRNGKey(i))
            return m

        m = dispatch(0)          # compile
        float(m["loss"])
        m = dispatch(1)          # warmup steady-state
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(args.iters):
            m = dispatch(i + 2)
        float(m["loss"])         # blocks on the chain through ts
        mean = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "model": args.model_name,
            "mode": "train_step",
            "batch": args.batch_size,
            "grad_accum": args.grad_accum,
            "remat": args.remat,
            # MEAN over chained steps (per-step medians are unmeasurable
            # without paying the remote-tunnel fetch per step)
            "mean_ms": round(mean * 1000, 2),
            "items_per_sec": round(args.batch_size / mean, 2),
            "platform": platform,
        }))
        return
    else:
        fwd = jax.jit(lambda p, s, v: jnp.sum(model.apply(p, s, v,
                                                          train=False)[0]))

        def run(i):
            return float(fwd(params, state, x + 0.01 * i))

    run(0)  # compile
    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    print(json.dumps({
        "model": args.model_name,
        "mode": "train_step" if args.train_step else "forward",
        "batch": args.batch_size,
        "median_ms": round(med * 1000, 2),
        "items_per_sec": round(args.batch_size / med, 2),
        "platform": platform,
    }))


if __name__ == "__main__":
    main()
