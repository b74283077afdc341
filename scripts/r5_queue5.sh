#!/bin/bash
# Retry of the lrdecay eval (its generate died silently mid-queue4 — no
# traceback, no OOM; transient tunnel/process kill) + CPU scoring.
set -x
cd /root/repo || exit 1
echo $$ > /tmp/queue5.pid

timeout -s TERM 2400 python scripts/fvd_mid_r5.py --phase eval --preset lrdecay --n-batches 2
# if the phase timed out mid-scoring, finish the remaining passes on CPU
python scripts/fvd_mid_r5.py --phase score --preset lrdecay
echo "QUEUE5 DONE"
