#!/bin/bash
# Round-4 chip queue, session 3: the mid-scale trained-weights FVD chain
# (VERDICT r3 item 3). Session-2's attempt died in iter-0 compile: a slow
# tunnel window pushed the AE compile to 718 s against a 480 s phase budget.
# This queue gives each phase a budget that survives a slow-window compile
# and persists the trained weights as a committable fp16 npz immediately
# after the GPT phase, so a later kill cannot lose them.
set -x
cd /root/repo || exit 1

timeout -s TERM 1500 python scripts/fvd_mid_r4.py --phase ae  --n-iter 600
timeout -s TERM 1100 python scripts/fvd_mid_r4.py --phase gpt --n-iter 400
python scripts/fvd_mid_r4.py --phase export
timeout 1500 python scripts/fvd_mid_r4.py --phase eval --n-batches 2
echo "QUEUE3 DONE"
