#!/bin/bash
# Round-5 chip queue, session 1, part 2 — runs after the BAIR FVD chain
# (r5_queue1.sh). Order: cheapest/highest-leverage first; every script
# checkpoints partial results to disk so a timeout keeps the evidence.
#   1. decode dispatch A/B at 64px (VERDICT r4 item 4, carried twice)
#   2. int8 serving gate: quality on trained r5 weights + interleaved
#      full-pipeline speed A/B (item 3)
#   3. kinetics-preset quality chain (item 7)
#   4. plateau diagnostic: LR-decay arm at mid scale (item 6)
#   5. compile-time probe at the flagship config (item 5)
set -x
cd /root/repo || exit 1

timeout -s TERM 1800 python scripts/dispatch_ab_r5.py
timeout -s TERM 4200 python scripts/int8_gate_r5.py
timeout -s TERM 4200 python scripts/fvd_mid_r5.py --phase ae  --preset kinetics --n-iter 300
timeout -s TERM 2400 python scripts/fvd_mid_r5.py --phase gpt --preset kinetics --n-iter 200
python scripts/fvd_mid_r5.py --phase verify --preset kinetics
timeout -s TERM 2400 python scripts/fvd_mid_r5.py --phase eval --preset kinetics --n-batches 2
timeout -s TERM 4500 python scripts/plateau_r5.py --phase train --n-iter 600
python scripts/plateau_r5.py --phase report
timeout -s TERM 2700 python scripts/compile_probe_r5.py
echo "QUEUE2 DONE"
