"""Round-3 sustained training run on the real TPU chip.

Proves the training stack converges at the full BAIR config over hundreds of
iterations (the reference's whole purpose is trained models,
`helpers/frame_autoencoder_trainer.py:104-151`): phase A runs the frame
autoencoder with R1 + ADA + EMA + vid steps live at 256^2 and the reference
batch sizes (`scripts/bairhd/train_frame_autoencoder.sh`), logging every loss
term plus a held-out rec-PSNR trend and PNG snapshots; phase B trains the
latent transformer on the frozen phase-A autoencoder
(`helpers/transformer_trainer.py:122-176`). Data is the procedural synthetic
dataset at full BAIR shapes (no real BAIR frames in this environment).

Usage:
    python scripts/train_sustained_r3.py --phase ae --n-iter 400
    python scripts/train_sustained_r3.py --phase gpt --n-iter 300
    python scripts/train_sustained_r3.py --summary   # write TRAINRUN.md table
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAVE = "runs_r3"
AE_NAME = "r3_ae_sustained"
GPT_NAME = "r3_gpt_sustained"


def base_cfg(bs_img=24, bs_vid=4):
    """Full BAIR shapes/losses at the reference's PER-ACCELERATOR batch
    (img 24 / vid 4: the reference trains its global 96/16 split over 4
    16 GB GPUs, `scripts/bairhd/train_frame_autoencoder.sh:3-4` + per-rank
    split `tools/engine.py:88`). The global batch needs 19.3 GB on one chip
    (measured); multi-chip dp runs it via the mesh instead."""
    from ccvs_tpu.config import get_config

    cfg = get_config("bairhd")
    return cfg.replace(
        save_path=SAVE,
        log_freq=10,
        save_freq=-1,
        data=dataclasses.replace(cfg.data, dataset="synthetic", num_workers=16,
                                 batch_size_img=bs_img, batch_size_vid=bs_vid),
    )


def ae_cfg(n_iter):
    cfg = base_cfg()
    # reference AE training values (`scripts/bairhd/train_frame_autoencoder.sh`:
    # skip_memory 4, skip_context 1..4, vid_len 4); ADA enabled on top (the
    # reference ships the controller but no shipped config turns it on).
    return cfg.replace(
        name=AE_NAME,
        n_iter=n_iter,
        save_latest_freq=50,  # crash-tolerant: lose at most ~50 iters
        ae=dataclasses.replace(cfg.ae, skip_memory=4, skip_context=(1, 2, 3, 4),
                               use_aug=True, remat=True),
    )


def gpt_cfg(n_iter):
    cfg = base_cfg()
    return cfg.replace(
        name=GPT_NAME,
        n_iter=n_iter,
        save_latest_freq=50,  # crash-tolerant rolling checkpoint
        ae=dataclasses.replace(cfg.ae, skip_memory=4, skip_context=(1, 2, 3, 4)),
        # block remat: without it the fwd/bwd step needs ~18 GB on one chip
        # (measured OOM at B=4, L=1023); with it the full batch fits
        gpt=dataclasses.replace(cfg.gpt, remat=True),
    )


def run_ae(n_iter, resume=False):
    from ccvs_tpu.train.ae_trainer import FrameAutoencoderTrainer

    cfg = ae_cfg(n_iter)
    FrameAutoencoderTrainer(cfg).run(eval_every=25, snapshot_every=100,
                                     serialize_steps=True, resume=resume)


def run_gpt(n_iter, resume=False):
    from ccvs_tpu.train.transformer_trainer import TransformerTrainer
    from ccvs_tpu.utils.checkpoint import CheckpointManager

    cfg = gpt_cfg(n_iter)
    ckpt = CheckpointManager(os.path.join(SAVE, "checkpoints", AE_NAME))
    state = ckpt.load("qvid", "latest")
    # raw generator, not EMA: at 400 iters the 0.999-decay EMA is still ~67%
    # init (raw-G rec-PSNR 26 dB vs EMA 10 dB at iter 175 on the chip); the
    # reference's EMA choice assumes its 100k+-iter schedules
    ae_params = state["gen"]
    TransformerTrainer(cfg, ae_params).run(resume=resume)


def _series(log_name, keys):
    path = os.path.join(SAVE, "logs", log_name, "metrics.jsonl")
    out = {k: [] for k in keys}
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            for k in keys:
                if k in d:
                    out[k].append((d["step"], d[k]))
    return out


def summary():
    import numpy as np

    lines = ["# Sustained training run (round 3, real v5e chip)", ""]
    s = _series(AE_NAME, ["qvid_generator/g_loss", "qvid_generator/d_loss",
                          "qvid_eval/rec_psnr", "qvid_eval/rec_psnr_raw",
                          "qvid_eval/ada_p", "qvid_generator/r1_img"])

    def row(name, pts, fmt="{:.3f}"):
        if not pts:
            return f"| {name} | - | - | - |"
        v = [p[1] for p in pts]
        head = np.mean(v[: max(1, len(v) // 10)])
        tail = np.mean(v[-max(1, len(v) // 10):])
        return (f"| {name} | " + fmt.format(head) + " | " + fmt.format(tail)
                + f" | {len(v)} pts |")

    lines += [
        "## Phase A: frame autoencoder (full BAIR config, synthetic 256^2)",
        "",
        "R1 (every 16) + ADA (adaptive p) + EMA + per-iteration video rollout",
        "steps; reference per-accelerator batch (img 24 / vid 4 — the",
        "reference's global 96/16 over 4 GPUs).",
        "",
        "| metric | first 10% | last 10% | n |",
        "|---|---|---|---|",
        row("G loss", s["qvid_generator/g_loss"]),
        row("D loss", s["qvid_generator/d_loss"]),
        row("R1 (img)", s["qvid_generator/r1_img"], "{:.4f}"),
        row("held-out rec PSNR (EMA)", s["qvid_eval/rec_psnr"], "{:.2f} dB"),
        row("held-out rec PSNR (raw G)", s["qvid_eval/rec_psnr_raw"], "{:.2f} dB"),
        row("ADA p", s["qvid_eval/ada_p"], "{:.4f}"),
        "",
        "rec-PSNR trajectory, raw G (every 25 iters; EMA in parentheses —",
        "the reference's 0.999-decay EMA lags ~1/(1-decay)=1000 iters, so a",
        "400-iter run's EMA is still dominated by init):",
        "",
        "```",
        " ".join(f"{p[0]}:{p[1]:.1f}" for p in s["qvid_eval/rec_psnr_raw"]),
        "(EMA) " + " ".join(f"{p[0]}:{p[1]:.1f}" for p in s["qvid_eval/rec_psnr"]),
        "```",
        "",
    ]
    try:
        t = _series(GPT_NAME, ["transformer/nll"])
        lines += [
            "## Phase B: latent transformer on the frozen phase-A AE",
            "",
            "| metric | first 10% | last 10% | n |",
            "|---|---|---|---|",
            row("token NLL", t["transformer/nll"], "{:.4f}"),
            "",
            "NLL trajectory (every 10 iters):",
            "",
            "```",
            " ".join(f"{p[0]}:{p[1]:.2f}" for p in t["transformer/nll"][::10]),
            "```",
            "",
        ]
    except FileNotFoundError:
        lines += ["(transformer phase not run)", ""]
    snap_dir = os.path.join(SAVE, "logs", AE_NAME, "snapshots")
    if os.path.isdir(snap_dir):
        snaps = sorted(os.listdir(snap_dir))
        lines += [f"Reconstruction snapshots: `{snap_dir}/` "
                  f"({', '.join(snaps)})", ""]
    with open("TRAINRUN.md", "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["ae", "gpt"], default=None)
    ap.add_argument("--n-iter", type=int, default=400)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--summary", action="store_true")
    args = ap.parse_args()
    if args.summary:
        summary()
    elif args.phase == "ae":
        run_ae(args.n_iter, resume=args.resume)
    elif args.phase == "gpt":
        run_gpt(args.n_iter, resume=args.resume)
    else:
        ap.error("pass --phase ae|gpt or --summary")
