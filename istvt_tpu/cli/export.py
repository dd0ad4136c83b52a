"""AOT artifact export CLI — `python -m istvt_tpu.cli.export`.

Freezes a registry model (optionally checkpoint-restored and int8-
quantized) into a self-contained serving artifact directory
(serve_export.save_artifact): jax.export-serialized StableHLO per batch
bucket + weights npz + manifest. Consumers score with
`serve_export.load_artifact(dir)` (or `cli.serve --artifact dir`)
without importing the model zoo. The reference has no deployment path
(eval lives inside train_CNN.py); this is its production replacement.
"""
from __future__ import annotations

import argparse
import json


def build_parser():
    p = argparse.ArgumentParser("istvt_tpu.export")
    p.add_argument("--model_name", "-mn", default="istvt")
    p.add_argument("--seq_len", "-sl", type=int, default=6)
    p.add_argument("--input_size", "-is", type=int, default=300)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--checkpoint_dir", "-o", default=None,
                   help="orbax checkpoint dir (latest step restored)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="W8A8 serving path for the ST-layer GEMMs; the "
                        "artifact stores int8 weights + f32 scales")
    p.add_argument("--batch_sizes", type=int, nargs="+", default=[1, 16])
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--selftest", action="store_true",
                   help="reload the artifact and compare logits against "
                        "the live model on random inputs")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from istvt_tpu.core.platform import honor_env
    honor_env()

    import numpy as np
    from istvt_tpu.cli.serve import build_predictor
    from istvt_tpu.serve_export import load_artifact, save_artifact

    # reuse the serve CLI's model/restore/quantize wiring verbatim
    args.buckets = sorted(set(args.batch_sizes))
    args.max_batch = max(args.buckets)
    predictor = build_predictor(args)

    params, input_dtype = predictor.params, predictor.input_dtype
    if predictor.compute_dtype is not None:
        # bake the Predictor's per-call float cast into stored weights
        from istvt_tpu.core import tree as _tree
        params = _tree.cast(params, predictor.compute_dtype)
        input_dtype = predictor.compute_dtype
    clip_shape = (args.seq_len, args.input_size, args.input_size, 3)
    manifest = save_artifact(
        args.out, predictor.model, params, predictor.state,
        input_shape=clip_shape, batch_sizes=predictor.batch_sizes,
        input_dtype=input_dtype,
        extra_meta={"int8": bool(args.int8), "bf16": bool(args.bf16),
                    "checkpoint_dir": args.checkpoint_dir})
    print(json.dumps({k: manifest[k] for k in
                      ("model_name", "batch_sizes", "input_shape",
                       "platforms", "waived_custom_calls")}))

    if args.selftest:
        scorer = load_artifact(args.out)
        rng = np.random.default_rng(0)
        n = min(predictor.batch_sizes[-1], 4)
        clips = rng.standard_normal((n,) + clip_shape).astype(np.float32)
        got = scorer.predict(clips)["logits"]
        want = predictor.predict(clips)["logits"]
        delta = float(np.max(np.abs(got - want)))
        print(f"selftest: max |logit delta| = {delta:.3e} over {n} clips")
        if not np.all(np.isfinite(got)) or delta > 1e-3:
            raise SystemExit(f"selftest FAILED (delta {delta})")


if __name__ == "__main__":
    main()
