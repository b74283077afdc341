"""Round-4 extended sustained training on the real TPU chip.

Same full-BAIR configuration as round 3 (scripts/train_sustained_r3.py —
reference batch/loss schedule, R1 + ADA + EMA + vid rollout steps) but pushed
to longer horizons (VERDICT round-3 item 8: phase A toward >= 2k iters, phase
B to NLL plateau), writing under runs_r4 so the round-3 artifacts stay
intact. Crash-tolerant: rolling `latest` checkpoint every 50 iters, resume
with --resume.

Usage:
    python scripts/train_sustained_r4.py --phase ae --n-iter 2000 [--resume]
    python scripts/train_sustained_r4.py --phase gpt --n-iter 400 [--resume]
    python scripts/train_sustained_r4.py --summary
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import train_sustained_r3 as base

base.SAVE = "runs_r4"
base.AE_NAME = "r4_ae_sustained"
base.GPT_NAME = "r4_gpt_sustained"


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["ae", "gpt"], default=None)
    ap.add_argument("--n-iter", type=int, default=2000)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--summary", action="store_true")
    args = ap.parse_args()
    if args.summary:
        base.summary()
    elif args.phase == "ae":
        base.run_ae(args.n_iter, resume=args.resume)
    elif args.phase == "gpt":
        base.run_gpt(args.n_iter, resume=args.resume)
    else:
        ap.error("pass --phase ae|gpt or --summary")
