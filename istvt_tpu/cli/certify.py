"""Serving-recipe accuracy certification CLI —
`python -m istvt_tpu.cli.certify`.

Runs train/certify.certify_recipe (full-geometry teacher -> cross-
geometry distilled student -> int8 serving path -> LRP localization,
all scored on a disjoint val split) and writes the result as a JSON
artifact. The production capture lives at CERT_RECIPE.json (repo root):
the 224^2/depth-6 int8 student certified against a 300^2/depth-12
teacher — the accuracy contract behind the composed-recipe throughput
number in bench.py / docs/SERVING.md. Reference bar: the trained model
IS the paper geometry (network/vivit/vivit.py:201); a reduced-geometry
substitute must carry this proof.
"""
from __future__ import annotations

import argparse
import json


def build_parser():
    p = argparse.ArgumentParser("istvt_tpu.certify")
    p.add_argument("--teacher_size", type=int, default=300)
    p.add_argument("--teacher_depth", type=int, default=12)
    p.add_argument("--student_size", type=int, default=224)
    p.add_argument("--student_depth", type=int, default=6)
    p.add_argument("--seq_len", "-sl", type=int, default=6)
    p.add_argument("--train_clips", type=int, default=48)
    p.add_argument("--val_clips", type=int, default=32)
    p.add_argument("--batch_size", "-bs", type=int, default=8)
    p.add_argument("--patch_size", type=int, default=None)
    p.add_argument("--teacher_epochs", type=int, default=15)
    p.add_argument("--distill_epochs", type=int, default=15)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--alpha", type=float, default=0.5,
                   help="hard-label loss weight (cli.train default)")
    p.add_argument("--distill_T", type=float, default=2.0)
    p.add_argument("--attn_weight", type=float, default=1.0,
                   help="attention-transfer weight (0 = logit-only "
                        "distillation; see train/losses.make_distill_loss)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--train_amp", default="0.3,1.5",
                   help="graded artifact-amplitude range 'lo,hi' for the "
                        "TRAIN set ('none' = fixed amplitude). Graded "
                        "difficulty is what keeps gradient-weighted LRP "
                        "localized at full geometry (train/certify.py "
                        "data note); production default 0.3,1.5")
    p.add_argument("--temporal_aug", type=int, default=1,
                   help="subset-frame-fake batches added to the distill "
                        "set (temporal boundary transfer; 0 disables)")
    p.add_argument("--cam_chunk", type=int, default=None,
                   help="teacher-LRP batch chunk (HBM relief at full "
                        "geometry; must divide batch_size)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute for the two training loops")
    p.add_argument("--no_int8", action="store_true")
    p.add_argument("--no_lrp", action="store_true")
    p.add_argument("--no_teacher_lrp", action="store_true",
                   help="skip the teacher's own LRP localization "
                        "diagnostic (teacher_lrp_* fields)")
    p.add_argument("--teacher_ckpt", default=None,
                   help="teacher param checkpoint path: restored if it "
                        "exists, written after training otherwise — "
                        "lets distill-hyperparameter iteration skip "
                        "teacher retraining")
    p.add_argument("--int8_delta_max", type=float, default=1.0)
    p.add_argument("--out", default=None, help="JSON artifact path")
    p.add_argument("--export", default=None, metavar="DIR",
                   help="also export the certified int8 student as an "
                        "AOT serving artifact (serve_export) and "
                        "selftest it against the certification's own "
                        "val logits (criterion artifact_matches)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (honor_env)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
    from istvt_tpu.core.platform import honor_env
    honor_env()
    import jax

    from istvt_tpu.train.certify import certify_recipe
    import jax.numpy as jnp

    print(f"[certify] backend: {jax.devices()[0].platform} "
          f"x{jax.device_count()}")
    result = certify_recipe(
        teacher_size=args.teacher_size, teacher_depth=args.teacher_depth,
        student_size=args.student_size, student_depth=args.student_depth,
        seq_len=args.seq_len, train_clips=args.train_clips,
        val_clips=args.val_clips, batch_size=args.batch_size,
        patch_size=args.patch_size, teacher_epochs=args.teacher_epochs,
        train_amp_range=(None if args.train_amp.lower() == "none" else
                         tuple(float(v)
                               for v in args.train_amp.split(","))),
        distill_epochs=args.distill_epochs, lr=args.lr, seed=args.seed,
        alpha=args.alpha, temperature=args.distill_T,
        attn_weight=args.attn_weight, temporal_aug=args.temporal_aug,
        cam_chunk=args.cam_chunk,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        int8_delta_max=args.int8_delta_max,
        run_int8=not args.no_int8, run_lrp=not args.no_lrp,
        diag_teacher_lrp=not args.no_teacher_lrp,
        teacher_ckpt=args.teacher_ckpt, export_dir=args.export)
    result["backend"] = jax.devices()[0].platform
    blob = json.dumps(result, indent=2, default=float)
    print(blob)
    if args.out:
        with open(args.out, "w") as f:
            f.write(blob + "\n")
        print(f"[certify] wrote {args.out}")
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
