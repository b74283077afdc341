#!/bin/bash
# Round-5 session-3 chip queue.
#
# 1. Rebuild orbax checkpoints from the committed fp16 npz mirrors (the
#    disk reset between sessions wiped runs_r5/checkpoints/).
# 2. Close the lrdecay quality loop: the queue5 retry never ran (round/session
#    ended); eval + score the plateau-diagnostic LR-decay pair.
# 3. Extended mid AE run (VERDICT r4 item 6 follow-through): the winning
#    x0.3-decay arm continued to 1200 iters with a second decay at 900,
#    npz-mirrored so any kill leaves committable weights -> GPT -> eval.
# 4. If time remains: regenerate bair/kinetics evals with 4x more videos
#    (fused serving makes this chip-minutes) for chunked FVD stats.
#
# Every eval uses --fused (exact single-program serving, gated by
# runs_r5/dispatch_ab.json) and 8 batches = 32 videos (2 FVD chunks of 16).
set -x
cd /root/repo || exit 1
echo $$ > /tmp/queue6.pid

python scripts/fvd_mid_r5.py --phase import --preset lrdecay
python scripts/fvd_mid_r5.py --phase import --preset bair
python scripts/fvd_mid_r5.py --phase import --preset kinetics

timeout -s TERM 2400 python scripts/fvd_mid_r5.py --phase eval --preset lrdecay --n-batches 8 --fused
# finish any scoring passes the timeout cut off (CPU; chip untouched)
python scripts/fvd_mid_r5.py --phase score --preset lrdecay --n-batches 8
echo "QUEUE6 MILESTONE: lrdecay eval done"

timeout -s TERM 6600 python scripts/fvd_mid_r5.py --phase ae --preset ext --n-iter 1200
timeout -s TERM 1800 python scripts/fvd_mid_r5.py --phase gpt --preset ext --n-iter 400
python scripts/fvd_mid_r5.py --phase verify --preset ext
timeout -s TERM 2400 python scripts/fvd_mid_r5.py --phase eval --preset ext --n-batches 8 --fused
python scripts/fvd_mid_r5.py --phase score --preset ext --n-batches 8
echo "QUEUE6 MILESTONE: ext chain done"

timeout -s TERM 1800 python scripts/fvd_mid_r5.py --phase eval --preset bair --n-batches 8 --fused
python scripts/fvd_mid_r5.py --phase score --preset bair --n-batches 8
timeout -s TERM 1800 python scripts/fvd_mid_r5.py --phase eval --preset kinetics --n-batches 8 --fused
python scripts/fvd_mid_r5.py --phase score --preset kinetics --n-batches 8
echo "QUEUE6 DONE"
