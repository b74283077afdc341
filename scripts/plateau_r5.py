"""Round-5 plateau diagnostic (VERDICT r4 item 6).

Rounds 3-4's 256px AE runs plateau at 28-31 dB raw-G rec-PSNR from iter
~325 (TRAINRUN.md) vs the >32 dB ask. Before buying more chip hours, one
targeted experiment at the 64px mid scale where iterations are ~7 s:

  control    the r5 chain's own `r5_bair_ae` run (600 iters, the reference's
             constant lr=0.002, `quantized_video_model.py:239-243`)
  treatment  IDENTICAL config + step LR decay x0.3 after ~iter 300
             (cfg.lr_decay_at in optimizer updates; 2 G updates/iter at
             vid_step_every=1 -> 600)

If the treatment's late-run rec-PSNR keeps climbing past the control's
plateau, the plateau is an LR-schedule artifact (the fix transfers to the
256px flagship run); if both flatten at the same level, the binding
constraint is capacity/hours, not schedule.

    python scripts/plateau_r5.py --phase train [--n-iter 600]
    python scripts/plateau_r5.py --phase report
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import dataclasses

from fvd_mid_r5 import SAVE, mid_cfg

NAME = "r5_plateau_lrdecay"
CONTROL = "r5_bair_ae"
DECAY_AT_ITER = 300
OUT = os.path.join(SAVE, "plateau_diag.json")


def treatment_cfg(n_iter):
    cfg = mid_cfg("bair")
    updates_per_iter = 1 + (1 if cfg.ae.vid_step_every == 1 else 0)
    return cfg.replace(
        name=NAME,
        npz_mirror="",  # the chain npz stays the chain's; diag is orbax-only
        n_iter=n_iter,
        ae=dataclasses.replace(
            cfg.ae,
            lr_decay_at=DECAY_AT_ITER * updates_per_iter,
            lr_decay_mult=0.3,
        ),
    )


def run_train(n_iter):
    from ccvs_tpu.train.ae_trainer import FrameAutoencoderTrainer

    cfg = treatment_cfg(n_iter)
    resume = os.path.isdir(os.path.join(SAVE, "checkpoints", NAME))
    FrameAutoencoderTrainer(cfg).run(eval_every=25, snapshot_every=200,
                                     serialize_steps=True, resume=resume)


def psnr_trend(name):
    path = os.path.join(SAVE, "logs", name, "metrics.jsonl")
    trend = {}
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            if "qvid_eval/rec_psnr_raw" in d:
                trend[int(d["step"])] = round(d["qvid_eval/rec_psnr_raw"], 2)
    return trend


def run_report():
    ctrl = psnr_trend(CONTROL)
    treat = psnr_trend(NAME)

    def late_stats(tr, lo, hi):
        vals = [v for k, v in tr.items() if lo <= k <= hi]
        return {"mean": round(sum(vals) / max(1, len(vals)), 2),
                "max": max(vals) if vals else None, "n": len(vals)}

    out = {
        "design": "identical 64px mid AE config; control = constant lr 0.002 "
                  f"(the r5 chain run), treatment = x0.3 step decay at iter "
                  f"{DECAY_AT_ITER}; raw-G held-out rec-PSNR every 25 iters",
        "control_run": CONTROL,
        "treatment_run": NAME,
        "control_psnr_raw": ctrl,
        "treatment_psnr_raw": treat,
        "control_pre_decay": late_stats(ctrl, 150, DECAY_AT_ITER),
        "treatment_pre_decay": late_stats(treat, 150, DECAY_AT_ITER),
        "control_post_decay": late_stats(ctrl, DECAY_AT_ITER + 25, 10**9),
        "treatment_post_decay": late_stats(treat, DECAY_AT_ITER + 25, 10**9),
    }
    d = (out["treatment_post_decay"]["mean"] or 0) - (
        out["control_post_decay"]["mean"] or 0)
    pre_d = (out["treatment_pre_decay"]["mean"] or 0) - (
        out["control_pre_decay"]["mean"] or 0)
    out["post_decay_delta_db"] = round(d, 2)
    out["pre_decay_delta_db"] = round(pre_d, 2)
    out["verdict"] = (
        "LR schedule is (part of) the plateau: decay arm gains "
        f"{d:+.2f} dB post-decay (pre-decay arms differed {pre_d:+.2f} dB)"
        if d - pre_d > 0.5 else
        "plateau is NOT an LR-schedule artifact at this scale "
        f"(post-decay delta {d:+.2f} dB vs pre-decay {pre_d:+.2f} dB); "
        "binding constraint is capacity/hours")
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["train", "report"], required=True)
    ap.add_argument("--n-iter", type=int, default=600)
    args = ap.parse_args()
    if args.phase == "train":
        run_train(args.n_iter)
    else:
        run_report()
