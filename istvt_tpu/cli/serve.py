"""Serving daemon CLI — `python -m istvt_tpu.cli.serve`.

Stands up the HTTP batch-scoring daemon (serve_daemon.ServeDaemon) on a
registry model, optionally restored from an orbax checkpoint and
quantized for the int8 W8A8 serving path. The deployment-time analog of
cli/score.py (model/checkpoint/int8 flags shared); the reference has no
serving runtime (its eval is welded into train_CNN.py's epoch loop).
"""
from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser("istvt_tpu.serve")
    p.add_argument("--model_name", "-mn", default="istvt")
    p.add_argument("--seq_len", "-sl", type=int, default=6)
    p.add_argument("--input_size", "-is", type=int, default=300)
    p.add_argument("--checkpoint_dir", "-o", default=None,
                   help="orbax checkpoint dir (latest step restored)")
    p.add_argument("--artifact", default=None,
                   help="serve a cli/export AOT artifact directory "
                        "instead of building a model (model/checkpoint/"
                        "quantize flags are ignored; buckets and clip "
                        "shape come from the manifest)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8753)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="W8A8 serving path for the ST-layer GEMMs")
    p.add_argument("--max_batch", type=int, default=16,
                   help="coalesced device batch (also the largest "
                        "compile bucket)")
    p.add_argument("--max_wait_ms", type=float, default=5.0,
                   help="linger for batch coalescing")
    p.add_argument("--buckets", type=int, nargs="+", default=None,
                   help="compile bucket sizes (default: 1, max_batch/2, "
                        "max_batch)")
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--no_warmup", action="store_true",
                   help="skip the bucket-compile warmup pass")
    p.add_argument("--verbose", action="store_true")
    return p


def build_predictor(args):
    """Shared model/restore/quantize wiring (mirrors cli/score.py)."""
    import jax
    import jax.numpy as jnp
    from istvt_tpu.core.config import ISTVTConfig
    from istvt_tpu.models.registry import model_selection
    from istvt_tpu.serve import Predictor

    platform = jax.devices()[0].platform
    from istvt_tpu.models.istvt import infer_feat_hw
    feat_hw = infer_feat_hw(args.input_size)
    cfg = ISTVTConfig(num_frames=args.seq_len, image_size=args.input_size,
                      feat_hw=feat_hw, depth=args.depth,
                      use_pallas=platform == "tpu",
                      quantize="int8" if args.int8 else "none")
    model = model_selection(args.model_name, num_out_classes=1, cfg=cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    if args.checkpoint_dir:
        from istvt_tpu.core.checkpoint import CheckpointManager
        from istvt_tpu.core.config import TrainConfig
        from istvt_tpu.train import step as S
        from istvt_tpu.train.schedule import cosine_schedule
        opt = S.make_optimizer(TrainConfig(), cosine_schedule(1e-4, 1))
        ts = S.create_train_state(model, jax.random.PRNGKey(0), opt)
        mgr = CheckpointManager(args.checkpoint_dir)
        restored = mgr.restore(template=ts)
        if restored is not None:
            params, state = restored.params, restored.model_state
            print(f"restored step {mgr.latest_step()}")

    compute_dtype = input_dtype = None
    if args.int8 and args.model_name == "istvt":
        from istvt_tpu.core import tree as _tree
        from istvt_tpu.models import istvt as _istvt
        params = _tree.cast(params, jnp.bfloat16)
        params = _istvt.quantize_params(params)
        input_dtype = jnp.bfloat16
    elif args.bf16:
        compute_dtype = jnp.bfloat16
    buckets = args.buckets or sorted({1, max(args.max_batch // 2, 1),
                                      args.max_batch})
    return Predictor(model, params, state, batch_sizes=buckets,
                     compute_dtype=compute_dtype, input_dtype=input_dtype)


def main(argv=None):
    args = build_parser().parse_args(argv)
    from istvt_tpu.core.platform import honor_env
    honor_env()

    import numpy as np
    from istvt_tpu.serve_daemon import ServeDaemon

    if args.artifact:
        from istvt_tpu.serve_export import load_artifact
        predictor = load_artifact(args.artifact)
        clip_shape = tuple(predictor.manifest["input_shape"])
        args.model_name = predictor.manifest.get("model_name",
                                                 args.model_name)
    else:
        predictor = build_predictor(args)
        clip_shape = (args.seq_len, args.input_size, args.input_size, 3)
    if not args.no_warmup:
        # compile every bucket up front so first requests aren't slow
        for b in predictor.batch_sizes:
            x = np.zeros((b,) + clip_shape, np.float32)
            predictor.predict(x)
            print(f"warm bucket {b}")
    daemon = ServeDaemon(predictor, clip_shape, host=args.host,
                         port=args.port, max_batch=args.max_batch,
                         max_wait_ms=args.max_wait_ms,
                         verbose=args.verbose)
    print(f"serving {args.model_name} on http://{args.host}:{daemon.port} "
          f"(buckets {predictor.batch_sizes})", flush=True)
    try:
        daemon.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        daemon.close()


if __name__ == "__main__":
    main()
