"""Train/eval CLI — `python -m istvt_tpu.cli.train`.

Flag parity with the reference driver's argparse surface
(reference train_CNN.py:1016-1058: -mn model name, -sl seq_len, -is input
size, -bs batch size, -q quality, -d sub_dataset, -tf transform preset,
--continue_train/-mp resume, --test_mode eval-only), driving ONE typed
config consumed by the Trainer instead of 30 per-model branches.
"""
from __future__ import annotations

import argparse

import jax


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("istvt_tpu.train")
    p.add_argument("--model_name", "-mn", default="istvt",
                   help="registry key (reference models.py:240-282)")
    p.add_argument("--seq_len", "-sl", type=int, default=6)
    p.add_argument("--input_size", "-is", type=int, default=300)
    p.add_argument("--batch_size", "-bs", type=int, default=16)
    p.add_argument("--epochs", "-e", type=int, default=40)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--optimizer", choices=["adamw", "sgd"], default="adamw")
    p.add_argument("--quality", "-q", choices=["hq", "lq"], default="hq")
    p.add_argument("--dataset", "-d", default="ff++",
                   choices=["ff++", "celeb", "oulu", "dfdc", "synthetic",
                            "ff++video"])
    p.add_argument("--data_root", default="")
    p.add_argument("--transform", "-tf", default="300",
                   help="preset: 299|256|300|aug|shuffle (train_CNN.py:154-161)")
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--checkpoint_dir", "-o", default="./output")
    p.add_argument("--continue_train", action="store_true")
    p.add_argument("--model_path", "-mp", default=None)
    p.add_argument("--test_mode", action="store_true", help="eval only")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh_model", type=int, default=1,
                   help="tensor-parallel axis size (DP gets the rest)")
    p.add_argument("--mesh_pipe", type=int, default=1,
                   help="pipeline-parallel stages over the ST layer "
                        "stack (parallel/pp.py; must divide depth; "
                        "composes with --mesh_model>1 via the manual-"
                        "Megatron TP layer body)")
    p.add_argument("--microbatches", type=int, default=None,
                   help="pipeline microbatch count (default: stage count)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="gradient-accumulation microbatches per optimizer "
                        "step (shrinks backward activation memory ~k; "
                        "must divide batch_size)")
    p.add_argument("--recal_bn", type=int, default=0, metavar="N",
                   help="after training, recalibrate BatchNorm running "
                        "stats over N train batches (fixes eval-mode "
                        "collapse after SHORT runs: running stats keep an "
                        "O(0.9^steps) residual of their init)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 forward/backward vs f32 master params")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint each ST layer (memory saver)")
    p.add_argument("--use_pallas", action="store_true",
                   help="fused Pallas attention kernels (TPU)")
    p.add_argument("--reference_schedule", action="store_true",
                   help="use the reference's manual lr rule "
                        "(train_CNN.py:209-211) instead of cosine")
    p.add_argument("--dataset_len", type=int, default=None)
    p.add_argument("--depth", type=int, default=12,
                   help="ST-transformer depth (12 = paper; lower for "
                        "smoke runs)")
    p.add_argument("--use_native_decode", action="store_true",
                   help="C++ clip decoder fast path (pixels differ "
                        "slightly from PIL on downscale — opt-in)")
    p.add_argument("--boxes", default=None, metavar="MANIFEST_JSON",
                   help="ff++video only: external detector crop boxes "
                        "{video: {frame: [y0,x0,h,w]}} overriding the "
                        "skin-prior localizer (docs/DATA.md)")
    p.add_argument("--dump_attns_every", type=int, default=0,
                   help="save ensemble attention maps (s_attns metrics "
                        "keys) as .npy every N iterations, reference "
                        "train_CNN.py:396-401 (0 = off)")
    p.add_argument("--distill_from", default=None, metavar="CKPT_DIR",
                   help="knowledge distillation (train/distill.py): orbax"
                        " checkpoint dir of a TEACHER (same model_name;"
                        " its depth via --teacher_depth). Teacher logits"
                        " are injected per batch and the loss becomes"
                        " losses.distillation_bce — train a shallower"
                        " --depth student that serves proportionally"
                        " faster (docs/SERVING.md levers)")
    p.add_argument("--teacher_depth", type=int, default=12,
                   help="--distill_from: the teacher's ST-layer count")
    p.add_argument("--teacher_input_size", type=int, default=None,
                   help="--distill_from: the teacher's input size when it"
                        " differs from the student's -is (cross-geometry"
                        " distillation: train clips are loaded at the"
                        " TEACHER size, the teacher scores them, and the"
                        " student sees their bilinear downscale — the"
                        " composed reduced-geometry recipe in"
                        " docs/SERVING.md)")
    p.add_argument("--teacher_optimizer", choices=["adamw", "sgd"],
                   default="adamw",
                   help="--distill_from: optimizer the teacher ckpt was"
                        " trained with (restore-template shape only)")
    p.add_argument("--distill_alpha", type=float, default=0.5,
                   help="hard-label loss weight (1-alpha on the soft"
                        " teacher term); 0 = learn from the teacher only")
    p.add_argument("--distill_T", type=float, default=2.0,
                   help="distillation temperature")
    return p


def make_datasets(args):
    from istvt_tpu.data import (Celeb, OULU, SyntheticVideoDataset,
                                VideoSeqDataset, select_transform)
    tf = select_transform(args.transform)
    if args.dataset == "synthetic":
        train = SyntheticVideoDataset(args.dataset_len or 64, args.seq_len,
                                      args.input_size, seed=args.seed)
        val = SyntheticVideoDataset(16, args.seq_len, args.input_size,
                                    seed=args.seed + 1)
        return train, val
    if args.dataset == "oulu":
        train = OULU(root=args.data_root, mode="Train", size=args.input_size,
                     seq_len=args.seq_len, transform=tf["train"],
                     dataset_len=args.dataset_len)
        val = OULU(root=args.data_root, mode="Test", size=args.input_size,
                   seq_len=args.seq_len, transform=tf["val"])
        return train, val
    if args.dataset in ("celeb", "dfdc"):
        train = Celeb(root=args.data_root, mode="Train", size=args.input_size,
                      seq_len=args.seq_len, transform=tf["train"],
                      dataset_len=args.dataset_len)
        val = Celeb(root=args.data_root, mode="Test", size=args.input_size,
                    seq_len=args.seq_len, transform=tf["val"])
        return train, val
    use_native = getattr(args, "use_native_decode", False)
    if args.dataset == "ff++video":
        # raw .mp4 tree: decode + face-crop on the fly (video_frontend)
        from istvt_tpu.data.video_frontend import RawVideoDataset
        # backend pinned (not auto): cv2 by default, native via
        # --use_native_decode — same determinism contract as the frame
        # datasets (the two scalers differ in filter phase)
        train = RawVideoDataset(root=args.data_root, quality=args.quality,
                                mode="Train", size=args.input_size,
                                seq_len=args.seq_len,
                                dataset_len=args.dataset_len,
                                seed=args.seed,
                                use_native=use_native,
                                boxes=getattr(args, "boxes", None))
        val = RawVideoDataset(root=args.data_root, quality=args.quality,
                              mode="Test", size=args.input_size,
                              seq_len=args.seq_len, return_fake_type=True,
                              use_native=use_native,
                              boxes=getattr(args, "boxes", None))
        return train, val
    train = VideoSeqDataset(root=args.data_root, quality=args.quality,
                            transform=tf["train"], size=args.input_size,
                            mode="Train", seq_len=args.seq_len,
                            dataset_len=args.dataset_len, seed=args.seed,
                            use_native=use_native)
    val = VideoSeqDataset(root=args.data_root, quality=args.quality,
                          transform=tf["val"], size=args.input_size,
                          mode="Test", seq_len=args.seq_len,
                          return_fake_type=True, use_native=use_native)
    return train, val


def main(argv=None):
    args = build_parser().parse_args(argv)

    from istvt_tpu.core.platform import honor_env
    honor_env()

    from istvt_tpu.core.config import DataConfig, ISTVTConfig, TrainConfig
    from istvt_tpu.core.mesh import make_mesh
    from istvt_tpu.data import ClipLoader
    from istvt_tpu.models.registry import model_selection
    from istvt_tpu.train.trainer import Trainer, evaluate

    from istvt_tpu.models.istvt import infer_feat_hw
    cfg = ISTVTConfig(num_frames=args.seq_len, image_size=args.input_size,
                      feat_hw=infer_feat_hw(args.input_size),
                      depth=args.depth,
                      dropout=args.dropout,
                      use_pallas=args.use_pallas, remat=args.remat)
    model = model_selection(args.model_name, num_out_classes=1,
                            dropout=args.dropout, cfg=cfg)
    tc = TrainConfig(model_name=args.model_name, num_epochs=args.epochs,
                     base_lr=args.lr, optimizer=args.optimizer,
                     seed=args.seed, checkpoint_dir=args.checkpoint_dir,
                     compute_dtype="bfloat16" if args.bf16 else "float32")
    dc = DataConfig(root=args.data_root, quality=args.quality,
                    seq_len=args.seq_len, input_size=args.input_size,
                    batch_size=args.batch_size, dataset=args.dataset)

    cross_geo = bool(args.distill_from and args.teacher_input_size
                     and args.teacher_input_size != args.input_size)
    if cross_geo:
        # train clips load at the TEACHER geometry (the batch_hook
        # downscales them for the student after scoring); val stays at
        # the student's size — eval runs the student alone
        import copy as _copy
        targs = _copy.copy(args)
        targs.input_size = args.teacher_input_size
        train_ds, _ = make_datasets(targs)
        _, val_ds = make_datasets(args)
    else:
        train_ds, val_ds = make_datasets(args)
    train_loader = ClipLoader(train_ds, batch_size=args.batch_size,
                              shuffle=True, num_workers=args.num_workers,
                              seed=args.seed)
    val_loader = ClipLoader(val_ds, batch_size=args.batch_size,
                            shuffle=False, num_workers=args.num_workers)

    mesh = make_mesh(model=args.mesh_model, pipe=args.mesh_pipe)
    steps_per_epoch = max(len(train_loader), 1)
    step_hook = None
    if args.dump_attns_every > 0:
        from istvt_tpu.train.attn_dump import AttnDumper
        step_hook = AttnDumper(args.checkpoint_dir or ".",
                               every=args.dump_attns_every)
    loss_fn, batch_hook = None, None
    if args.distill_from:
        import dataclasses as _dc

        import jax as _jax

        from istvt_tpu.core.checkpoint import CheckpointManager
        from istvt_tpu.train import distill as D
        from istvt_tpu.train import losses as L
        from istvt_tpu.train import step as S
        from istvt_tpu.train.schedule import cosine_schedule
        tsize = args.teacher_input_size or args.input_size
        tcfg = _dc.replace(cfg, depth=args.teacher_depth, dropout=0.0,
                           image_size=tsize,
                           feat_hw=infer_feat_hw(tsize))
        teacher = model_selection(args.model_name, num_out_classes=1,
                                  dropout=0.0, cfg=tcfg)
        topt = S.make_optimizer(
            TrainConfig(optimizer=args.teacher_optimizer),
            cosine_schedule(1e-4, 1))
        tmpl = S.create_train_state(teacher, _jax.random.PRNGKey(0), topt)
        restored = CheckpointManager(args.distill_from).restore(
            template=tmpl)
        if restored is None:
            raise SystemExit(f"--distill_from: no checkpoint under "
                             f"{args.distill_from}")
        batch_hook = D.augment_with_teacher(
            D.make_teacher_fn(teacher, restored.params,
                              restored.model_state, mesh=mesh),
            student_size=args.input_size if cross_geo else None)
        loss_fn = L.make_distill_loss(args.distill_alpha, args.distill_T)
        print(f"distilling from {args.distill_from} "
              f"(teacher depth {args.teacher_depth}, size {tsize}, "
              f"alpha={args.distill_alpha}, T={args.distill_T})")
    trainer = Trainer(model, tc, dc, mesh=mesh, loss_fn=loss_fn,
                      batch_hook=batch_hook,
                      steps_per_epoch=steps_per_epoch,
                      use_reference_schedule=args.reference_schedule,
                      step_hook=step_hook,
                      microbatches=args.microbatches,
                      grad_accum=args.grad_accum,
                      recal_bn_batches=args.recal_bn)

    ts = trainer.init_state()
    if args.continue_train or args.test_mode:
        ts = trainer.restore(ts)

    if args.test_mode:
        # hq AND lq eval like the reference's per-quality loop
        # (train_CNN.py:843-984, visualize_feat_map.py:203-207)
        qualities = [args.quality]
        if args.dataset == "ff++" and args.data_root:
            qualities = ["hq", "lq"]
        for q in qualities:
            if q != args.quality:
                from istvt_tpu.data import Transform, VideoSeqDataset
                ds = VideoSeqDataset(
                    root=args.data_root, quality=q,
                    transform=make_datasets(args)[1].transform,
                    size=args.input_size, mode="Test",
                    seq_len=args.seq_len, return_fake_type=True)
                if len(ds.entries) == 0:
                    continue
                loader = ClipLoader(ds, batch_size=args.batch_size,
                                    shuffle=False,
                                    num_workers=args.num_workers)
            else:
                loader = val_loader
            ev = evaluate(model, ts.params, ts.model_state, loader, mesh,
                          compute_acer=args.dataset == "oulu")
            print(q, {k: round(v, 4) if isinstance(v, float) else v
                      for k, v in ev.items()})
        return

    trainer.fit(train_loader, val_loader, ts=ts)


if __name__ == "__main__":
    main()
