#!/bin/bash
# Round-5 chip queue, part 4 — after the fused-pipeline int8 gate.
#   1. lrdecay quality chain: GPT on the plateau diag's LR-decay AE
#      (27.8 dB vs the chain AE's 26.0, runs_r5/plateau_diag.json), then
#      the full generate->score eval as a third fvd_trained.json entry.
#   2. full 6-iter bench record run at the final serving config
#      (fused decode + parallel priming + whatever the int8 gate decided).
set -x
cd /root/repo || exit 1
echo $$ > /tmp/queue4.pid

python scripts/fvd_mid_r5.py --phase export-ae --preset lrdecay
timeout -s TERM 2400 python scripts/fvd_mid_r5.py --phase gpt --preset lrdecay --n-iter 400
python scripts/fvd_mid_r5.py --phase verify --preset lrdecay
timeout -s TERM 2400 python scripts/fvd_mid_r5.py --phase eval --preset lrdecay --n-batches 2
timeout -s TERM 2700 python bench.py
echo "QUEUE4 DONE"
