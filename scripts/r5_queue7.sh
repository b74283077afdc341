#!/bin/bash
# Round-5 session-3 chip queue, take 2 (queue6 was stopped after its first
# FVD pass exposed a ~310 MB/batch tunnel round-trip in the scoring path —
# the protocol resize ran on-device but materialized through the host;
# fixed by fusing resize into the jitted embed program, ~bitwise identical).
#
# Schedule (safest milestone first; chip scoring is now minutes/pass):
#   1. lrdecay: score the 32 generated videos (generation done in queue6).
#   2. ext chain: 1200-iter AE with two-step LR decay (npz-mirrored from
#      iter 25 -> kill-proof) -> GPT -> eval.
#   3. bair + kinetics: regenerate at 32 videos for chunked FVD stats.
# Checkpoints were already rebuilt from npz by queue6's import phase.
set -x
cd /root/repo || exit 1
echo $$ > /tmp/queue7.pid

timeout -s TERM 1800 python scripts/fvd_mid_r5.py --phase score --preset lrdecay --n-batches 8 --chip
echo "QUEUE7 MILESTONE: lrdecay scored"

timeout -s TERM 6600 python scripts/fvd_mid_r5.py --phase ae --preset ext --n-iter 1200
timeout -s TERM 1500 python scripts/fvd_mid_r5.py --phase gpt --preset ext --n-iter 400
python scripts/fvd_mid_r5.py --phase verify --preset ext
timeout -s TERM 2400 python scripts/fvd_mid_r5.py --phase eval --preset ext --n-batches 8 --fused
python scripts/fvd_mid_r5.py --phase score --preset ext --n-batches 8
echo "QUEUE7 MILESTONE: ext chain done"

timeout -s TERM 2400 python scripts/fvd_mid_r5.py --phase eval --preset bair --n-batches 8 --fused
python scripts/fvd_mid_r5.py --phase score --preset bair --n-batches 8
echo "QUEUE7 MILESTONE: bair rescored at n=32"
timeout -s TERM 2400 python scripts/fvd_mid_r5.py --phase eval --preset kinetics --n-batches 8 --fused
python scripts/fvd_mid_r5.py --phase score --preset kinetics --n-batches 8
echo "QUEUE7 DONE"
