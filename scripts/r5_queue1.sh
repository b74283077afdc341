#!/bin/bash
# Round-5 chip queue, session 1: the BAIR trained-weights FVD chain FIRST
# (VERDICT r4 item 1 — the round gate, third ask). Every latest checkpoint
# save already mirrors a committable fp16 npz (runs_r5/mid_weights_fp16.npz),
# so a kill at ANY point past iter 25 loses nothing. Budgets sized from the
# r4 session-3 measurements (AE: ~890 s iter-0 compile then ~7 s/it at 64px;
# GPT: ~250 s compile) with slow-window headroom.
set -x
cd /root/repo || exit 1

timeout -s TERM 6600 python scripts/fvd_mid_r5.py --phase ae  --n-iter 600
timeout -s TERM 3000 python scripts/fvd_mid_r5.py --phase gpt --n-iter 400
python scripts/fvd_mid_r5.py --phase verify
timeout -s TERM 2400 python scripts/fvd_mid_r5.py --phase eval --n-batches 2
echo "QUEUE1 DONE"
