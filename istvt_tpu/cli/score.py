"""Batch scoring CLI — `python -m istvt_tpu.cli.score`.

Score a directory tree of face-crop clips (FF++-style layout) with any
registry model: per-clip probabilities to JSONL, plus accuracy/AUC (and
ACER with --acer) when labels are derivable from the tree. The serving
analog of the reference's eval-only `--test_mode` path
(train_CNN.py:837-984) decoupled from the trainer.
"""
from __future__ import annotations

import argparse
import json


def build_parser():
    p = argparse.ArgumentParser("istvt_tpu.score")
    p.add_argument("--model_name", "-mn", default="istvt")
    p.add_argument("--data_root", required=False, default="")
    p.add_argument("--dataset", "-d", default="ff++",
                   choices=["ff++", "celeb", "synthetic"])
    p.add_argument("--quality", "-q", default="hq")
    p.add_argument("--seq_len", "-sl", type=int, default=6)
    p.add_argument("--input_size", "-is", type=int, default=300)
    p.add_argument("--batch_size", "-bs", type=int, default=16)
    p.add_argument("--checkpoint_dir", "-o", default=None,
                   help="orbax checkpoint dir (latest step restored)")
    p.add_argument("--out", default="scores.jsonl")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="W8A8 serving path for the ST-layer GEMMs "
                        "(TPU; models.istvt.quantize_params)")
    p.add_argument("--acer", action="store_true")
    p.add_argument("--max_clips", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from istvt_tpu.core.platform import honor_env
    honor_env()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from istvt_tpu.core.config import ISTVTConfig
    from istvt_tpu.data import (Celeb, ClipLoader, SyntheticVideoDataset,
                                Transform, VideoSeqDataset)
    from istvt_tpu.models.registry import model_selection
    from istvt_tpu.serve import Predictor
    from istvt_tpu.train import metrics as M

    platform = jax.devices()[0].platform
    from istvt_tpu.models.istvt import infer_feat_hw
    feat_hw = infer_feat_hw(args.input_size)
    cfg = ISTVTConfig(num_frames=args.seq_len, image_size=args.input_size,
                      feat_hw=feat_hw, use_pallas=platform == "tpu",
                      quantize="int8" if args.int8 else "none")
    model = model_selection(args.model_name, num_out_classes=1, cfg=cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    if args.checkpoint_dir:
        from istvt_tpu.core.checkpoint import CheckpointManager
        from istvt_tpu.core.config import TrainConfig
        from istvt_tpu.train.schedule import cosine_schedule
        from istvt_tpu.train import step as S
        opt = S.make_optimizer(TrainConfig(), cosine_schedule(1e-4, 1))
        ts = S.create_train_state(model, jax.random.PRNGKey(0), opt)
        mgr = CheckpointManager(args.checkpoint_dir)
        restored = mgr.restore(template=ts)
        if restored is not None:
            params, state = restored.params, restored.model_state
            print(f"restored step {mgr.latest_step()}")

    if args.dataset == "synthetic":
        ds = SyntheticVideoDataset(args.max_clips or 32, args.seq_len,
                                   args.input_size)
    elif args.dataset == "celeb":
        ds = Celeb(root=args.data_root, mode="Test", size=args.input_size,
                   seq_len=args.seq_len, transform=Transform(args.input_size),
                   dataset_len=args.max_clips)
    else:
        ds = VideoSeqDataset(root=args.data_root, quality=args.quality,
                             transform=Transform(args.input_size),
                             size=args.input_size, mode="Test",
                             seq_len=args.seq_len, return_fake_type=True,
                             dataset_len=args.max_clips)

    compute_dtype = input_dtype = None
    if args.int8 and args.model_name == "istvt":
        # match the deployed serving config (bench.py): bf16 weights ->
        # per-channel int8 + F32 scales. Only the INPUTS are cast per
        # call — a blanket compute_dtype cast would round the f32
        # quantization scales to bf16.
        from istvt_tpu.core import tree as _tree
        from istvt_tpu.models import istvt as _istvt
        params = _tree.cast(params, jnp.bfloat16)
        params = _istvt.quantize_params(params)
        input_dtype = jnp.bfloat16
    elif args.bf16:
        compute_dtype = jnp.bfloat16
    predictor = Predictor(model, params, state,
                          batch_sizes=(args.batch_size,),
                          compute_dtype=compute_dtype,
                          input_dtype=input_dtype)
    loader = ClipLoader(ds, batch_size=args.batch_size, shuffle=False)
    all_logits, all_labels = [], []
    with open(args.out, "w") as f:
        idx = 0
        for batch in loader:
            out = predictor.predict(batch["clips"])
            for j in range(len(out["logits"])):
                f.write(json.dumps({
                    "index": idx,
                    "logit": float(out["logits"][j]),
                    "prob": float(out["probs"][j]),
                    "pred": int(out["preds"][j]),
                    "label": int(batch["labels"][j]),
                }) + "\n")
                idx += 1
            all_logits.append(out["logits"])
            all_labels.append(batch["labels"])
    logits = np.concatenate(all_logits)
    labels = np.concatenate(all_labels)
    summary = {
        "n": int(labels.size),
        "accuracy": float(((logits > 0) == (labels == 1)).mean()),
        "auc": float(M.auc(jnp.asarray(logits), jnp.asarray(labels))),
    }
    if args.acer:
        c = M.confusion_counts(jnp.asarray(logits), jnp.asarray(labels))
        summary.update({k: float(v) for k, v in M.acer(c).items()})
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
