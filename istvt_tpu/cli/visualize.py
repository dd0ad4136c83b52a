"""Saliency visualization CLI — `python -m istvt_tpu.cli.visualize`.

The ISTVT interpretability driver (reference visualize_rel.py:46-299):
for each clip, generate spatial + temporal relevance maps via the LRP
rollout and write `<frame>_s.png` / `<frame>_t.png` overlays (JET over the
frame, 19x19 maps upsampled x16 to 304x304; reference :260-294). Also
covers the feature-relevance dump mode (visualize_feat_map.py:228-236).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("istvt_tpu.visualize")
    p.add_argument("--model_name", "-mn", default="istvt")
    p.add_argument("--seq_len", "-sl", type=int, default=6)
    p.add_argument("--input_size", "-is", type=int, default=300)
    p.add_argument("--quality", "-q", default="hq")
    p.add_argument("--data_root", default="")
    p.add_argument("--dataset", "-d", default="ff++",
                   choices=["ff++", "synthetic"])
    p.add_argument("--model_path", "-mp", default=None,
                   help="orbax checkpoint dir to restore params from")
    p.add_argument("--out_dir", default="./visualize")
    p.add_argument("--method", default="transformer_attribution",
                   choices=["transformer_attribution", "rollout",
                            "last_layer", "full_lrp"])
    p.add_argument("--index", type=int, default=0,
                   help="class logit to attribute (visualize_rel.py:257)")
    p.add_argument("--max_clips", type=int, default=1000,
                   help="stop after this many clips (visualize_rel.py:295)")
    p.add_argument("--mode", default="lrp",
                   choices=["lrp", "features", "channels"],
                   help="lrp: relevance overlays (visualize_rel.py); "
                        "features: grad*input relevance; channels: dump "
                        "DualNet feature-map channels as PNGs "
                        "(visualize_feat_map.py:228-236)")
    p.add_argument("--max_channels", type=int, default=64,
                   help="channels mode: how many of the 4096 channels")
    p.add_argument("--depth", type=int, default=12,
                   help="transformer depth (12 = paper model)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from istvt_tpu.core.platform import honor_env
    honor_env()

    import jax
    from istvt_tpu.core.config import ISTVTConfig
    from istvt_tpu.data import (SyntheticVideoDataset, Transform,
                                VideoSeqDataset)
    from istvt_tpu.interpret import (generate_feature_relevance,
                                     generate_lrp, render_saliency, save_png)
    from istvt_tpu.models import istvt

    if args.mode == "channels":
        return _dump_channels(args)

    from istvt_tpu.models.istvt import infer_feat_hw
    feat_hw = infer_feat_hw(args.input_size)
    cfg = ISTVTConfig(num_frames=args.seq_len, image_size=args.input_size,
                      feat_hw=feat_hw, depth=args.depth)
    params, state = istvt.init(jax.random.PRNGKey(0), cfg)
    if args.model_path:
        params, state = _restore(args.model_path, params, state)

    if args.dataset == "synthetic":
        ds = SyntheticVideoDataset(min(args.max_clips, 8), args.seq_len,
                                   args.input_size)
    else:
        ds = VideoSeqDataset(root=args.data_root, quality=args.quality,
                             transform=Transform(args.input_size),
                             size=args.input_size, mode="Vis",
                             seq_len=args.seq_len)

    for i in range(min(len(ds), args.max_clips)):
        item = ds[i]
        clips = item["clips"][None]       # (1, T, S, S, 3)
        frames01 = (clips[0] * 0.5 + 0.5)  # un-normalize for overlay
        names = [os.path.basename(p) for p in item["paths"]] \
            if "paths" in item else [f"clip{i:05d}_f{t}" for t in
                                     range(args.seq_len)]
        if args.mode == "features":
            rel = np.asarray(generate_feature_relevance(
                params, state, clips, cfg, index=args.index))[0]
            for t in range(args.seq_len):
                m = rel[t] / (rel[t].max() + 1e-12)
                save_png(os.path.join(args.out_dir, f"{names[t]}_feat.png"),
                         np.uint8(255 * m))
            continue
        if args.method == "full_lrp":
            # per-module ε-rule relevance propagation (interpret/full_lrp)
            from istvt_tpu.interpret.full_lrp import generate_full_lrp
            cam_s, cam_t = generate_full_lrp(params, state, clips, cfg,
                                             index=args.index)
        else:
            cam_s, cam_t = generate_lrp(params, state, clips, cfg,
                                        index=args.index,
                                        method=args.method)
        cam_s, cam_t = np.asarray(cam_s)[0], np.asarray(cam_t)[0]
        for t in range(args.seq_len):
            frame = frames01[t]
            save_png(os.path.join(args.out_dir, f"{names[t]}_s.png"),
                     render_saliency(cam_s[t], frame, grid=cfg.feat_hw))
            save_png(os.path.join(args.out_dir, f"{names[t]}_t.png"),
                     render_saliency(cam_t[t], frame, grid=cfg.feat_hw))
            # plain resized frame alongside, like the reference
            # (visualize_rel.py:276)
            save_png(os.path.join(args.out_dir, f"{names[t]}.png"),
                     np.uint8(255 * np.clip(frame, 0, 1)))
        print(f"clip {i}: wrote {2 * args.seq_len} saliency overlays "
              f"to {args.out_dir}")


def _restore(path, params, state):
    """Accept either a Trainer checkpoint dir (TrainState snapshots) or a
    bare {'params','state'} pytree save."""
    import jax
    try:
        from istvt_tpu.core.checkpoint import CheckpointManager
        from istvt_tpu.core.config import TrainConfig
        from istvt_tpu.train import step as S
        from istvt_tpu.train.schedule import cosine_schedule

        mgr = CheckpointManager(path)
        if mgr.latest_step() is not None:
            opt = S.make_optimizer(TrainConfig(), cosine_schedule(1e-4, 1))
            template = S.TrainState(
                params=params, model_state=state,
                opt_state=opt.init(params),
                step=jax.numpy.zeros((), jax.numpy.int32))
            ts = mgr.restore(template=template)
            print(f"restored trainer step {mgr.latest_step()}")
            return ts.params, ts.model_state
    except Exception:
        pass
    from istvt_tpu.core.checkpoint import load_pytree
    restored = load_pytree(path, {"params": params, "state": state})
    return restored["params"], restored["state"]


def _dump_channels(args):
    """DualNet feature-map channel dump (reference
    visualize_feat_map.py:228-236: all 2048 channels as PNGs per image)."""
    import jax
    import os
    from istvt_tpu.data import SyntheticVideoDataset, Transform, VideoSeqDataset
    from istvt_tpu.interpret import save_png
    from istvt_tpu.models import dualnet

    params, state, cfg = dualnet.init(jax.random.PRNGKey(0),
                                      img_size=args.input_size)
    if args.dataset == "synthetic":
        ds = SyntheticVideoDataset(1, 1, args.input_size)
        item = ds[0]
        img = item["clips"][0][None]
    else:
        ds = VideoSeqDataset(root=args.data_root, quality=args.quality,
                             transform=Transform(args.input_size),
                             size=args.input_size, mode="Vis", seq_len=1)
        img = ds[0]["clips"][0][None]
    (_, feat, _, _), _ = dualnet.apply(params, state, img, cfg, train=False)
    feat = np.asarray(feat)[0]                       # (h, w, 4096)
    n = min(args.max_channels, feat.shape[-1])
    for c in range(n):
        m = feat[:, :, c]
        m = (m - m.min()) / (m.max() - m.min() + 1e-12)
        save_png(os.path.join(args.out_dir, f"channel_{c:04d}.png"),
                 np.uint8(255 * m))
    print(f"wrote {n} feature-map channels to {args.out_dir}")


if __name__ == "__main__":
    main()
