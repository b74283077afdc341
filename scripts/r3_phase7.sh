#!/bin/bash
# Round-3 chip queue, part 7 (restarted round after the VM re-image at
# ~11:05 UTC wiped the gitignored checkpoints again). Measurement stages
# first, then the retrain + trained-weight stages, with HARD DEADLINES so
# the chip is free for the driver's end-of-round bench (~22:30 UTC).
#   bench -> flagship (kinetics + drums) -> AE retrain (300 it)
#   -> GPT (300 it) -> TRAINRUN summary -> phase-4 trained-weight showcase
#   -> [optional] on-chip int8 gate refresh -> [optional] batch scaling.
# Launch detached:  nohup bash scripts/r3_phase7.sh > runs_r3/pipeline7.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1
mkdir -p runs_r3

AE_DEADLINE=$(date -d '19:00 today' +%s)      # ae_run must END by here
GPT_DEADLINE=$(date -d '19:55 today' +%s)
SHOWCASE_START_BY=$(date -d '20:45 today' +%s)
GATE_START_BY=$(date -d '20:50 today' +%s)
SCALING_START_BY=$(date -d '21:05 today' +%s)
CHIP_FREE_BY=$(date -d '21:45 today' +%s)

# Wait for the foreground test suite to release the single CPU core.
if [ -f /tmp/pytest.pid ]; then
  PT=$(cat /tmp/pytest.pid)
  while kill -0 "$PT" 2>/dev/null; do
    echo "[pipeline7] waiting for pytest (pid $PT) at $(date)"
    sleep 60
  done
fi

echo "[pipeline7] probing chip health ..."
until timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
y = jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))
print('chip ok:', float(np.asarray(y)))
" > /dev/null 2>&1; do
  echo "[pipeline7] chip unresponsive at $(date); retrying in 60s"
  sleep 60
done
echo "[pipeline7] chip healthy at $(date)"

run_stage() {
  name=$1; shift
  echo "[pipeline7] === $name start $(date) ==="
  timeout "$@" >> "runs_r3/${name}.log" 2>&1
  rc=$?
  echo "[pipeline7] === $name exit $rc $(date) ==="
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

run_stage bench_r3_status 3600 python bench.py
run_stage flagship 5400 python scripts/flagship_configs_r3.py

# Phase A retrain: fresh run (checkpoints gone in the re-image); the metrics
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
  echo "[pipeline7] SKIP showcase (past $(date -d "@$SHOWCASE_START_BY"))"
fi

# Optional tail stages — the committed int8 gate artifact (CPU backend) is
# already valid; an on-chip refresh with trained weights is strictly better.
if [ "$(date +%s)" -lt "$GATE_START_BY" ]; then
  run_stage int8_gate "$(budget "$CHIP_FREE_BY" 3600)" python scripts/int8_gate_r3.py
else
  echo "[pipeline7] SKIP int8_gate (past deadline)"
fi
if [ "$(date +%s)" -lt "$SCALING_START_BY" ]; then
  run_stage batch_scaling "$(budget "$CHIP_FREE_BY" 3600)" python scripts/batch_scaling_r3.py
else
  echo "[pipeline7] SKIP batch_scaling (past deadline)"
fi

echo "[pipeline7] all stages done $(date)"
