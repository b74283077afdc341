#!/bin/bash
# Round-3 chip queue, part 6b (replaces r3_phase6.sh): rebuild the trained
# checkpoints lost to the VM reboot, then the trained-weight stages — with
# HARD WALL-CLOCK DEADLINES so the chip is free before the end-of-round
# bench run. The AE retrain is 300 iters (the committed 400-iter TRAINRUN
# curves stay in git history; this run only has to produce usable weights
# for the showcase/gates), and the optional tail stages are skipped when
# their start deadline has passed.
#   probe13 (w4a8 sweep) -> AE retrain (300 it) -> GPT (300 it)
#   -> TRAINRUN summary -> phase-4 trained-weight showcase
#   -> [optional] int8 gate refresh -> [optional] serving batch scaling.
# Launch detached:  nohup bash scripts/r3_phase6b.sh > runs_r3/pipeline6b.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1
mkdir -p runs_r3

# Hard deadlines (UTC epoch). Round ends ~17:18; chip must be free by 16:30.
AE_DEADLINE=$(date -d '14:10 today' +%s)      # ae_run must END by here
GPT_DEADLINE=$(date -d '15:10 today' +%s)
SHOWCASE_START_BY=$(date -d '15:45 today' +%s)
GATE_START_BY=$(date -d '15:20 today' +%s)
SCALING_START_BY=$(date -d '15:50 today' +%s)
CHIP_FREE_BY=$(date -d '16:30 today' +%s)

# Wait for the part-5 queue (bench + flagship) to release the chip.
if [ -f /tmp/pipeline5.pid ]; then
  P5=$(cat /tmp/pipeline5.pid)
  while kill -0 "$P5" 2>/dev/null; do
    echo "[pipeline6b] waiting for pipeline5 (pid $P5) at $(date)"
    sleep 120
  done
fi

echo "[pipeline6b] probing chip health ..."
until timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
y = jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))
print('chip ok:', float(np.asarray(y)))
" > /dev/null 2>&1; do
  echo "[pipeline6b] chip unresponsive at $(date); retrying in 60s"
  sleep 60
done
echo "[pipeline6b] chip healthy at $(date)"

run_stage() {
  name=$1; shift
  echo "[pipeline6b] === $name start $(date) ==="
  timeout "$@" >> "runs_r3/${name}.log" 2>&1
  rc=$?
  echo "[pipeline6b] === $name exit $rc $(date) ==="
}

# remaining seconds until $1, clamped to [60, $2]
budget() {
  local now left
  now=$(date +%s)
  left=$(( $1 - now ))
  [ "$left" -lt 60 ] && left=60
  [ "$left" -gt "$2" ] && left=$2
  echo "$left"
}

run_stage probe13 1800 python scripts/perf_probe13.py

# Phase A retrain: fresh run (checkpoints gone in the reboot); the metrics
# jsonl is append-mode, so rotate the previous run's logs (preserved in git
# history) before a FRESH run. Rolling latest-checkpoints every 50 iters
# mean a deadline kill still leaves usable weights for the later stages.
if [ -d runs_r3/checkpoints/r3_ae_sustained ]; then
  run_stage ae_run "$(budget "$AE_DEADLINE" 21600)" \
    python scripts/train_sustained_r3.py --phase ae --n-iter 300 --resume
else
  rm -rf runs_r3/logs/r3_ae_sustained runs_r3/logs/r3_gpt_sustained
  run_stage ae_run "$(budget "$AE_DEADLINE" 21600)" \
    python scripts/train_sustained_r3.py --phase ae --n-iter 300
fi
run_stage gpt_run "$(budget "$GPT_DEADLINE" 5400)" \
  python scripts/train_sustained_r3.py --phase gpt --n-iter 300
run_stage trainrun_summary 600 python scripts/train_sustained_r3.py --summary

# Phase-4 trained-weight showcase (generate + offline metrics + contact sheet).
if [ "$(date +%s)" -lt "$SHOWCASE_START_BY" ]; then
  bash scripts/r3_phase4.sh >> runs_r3/pipeline4.log 2>&1
else
  echo "[pipeline6b] SKIP showcase (past $(date -d "@$SHOWCASE_START_BY"))"
fi

# Optional tail stages — the committed int8 gate artifact is already valid,
# and batch scaling uses random-init weights; both are skippable.
if [ "$(date +%s)" -lt "$GATE_START_BY" ]; then
  run_stage int8_gate "$(budget "$CHIP_FREE_BY" 3600)" python scripts/int8_gate_r3.py
else
  echo "[pipeline6b] SKIP int8_gate (past deadline)"
fi
if [ "$(date +%s)" -lt "$SCALING_START_BY" ]; then
  run_stage batch_scaling "$(budget "$CHIP_FREE_BY" 3600)" python scripts/batch_scaling_r3.py
else
  echo "[pipeline6b] SKIP batch_scaling (past deadline)"
fi

echo "[pipeline6b] all stages done $(date)"
