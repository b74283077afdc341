#!/bin/bash
# Round-3 chip queue, part 6c: continuation after the in-flight AE retrain
# (the part-6 orchestrator was replaced mid-run; the 400-iter ae_run python
# it launched keeps running and this script waits on its PID). Deadlines
# keep the chip free for the end-of-round bench.
#   [wait ae_run] -> gpt_run (300 it) -> TRAINRUN summary -> flagship rerun
#   (drums crash fixed) -> phase-4 trained-weight showcase -> probe13
#   -> [optional] int8 gate refresh -> [optional] batch scaling.
# Launch detached:  nohup bash scripts/r3_phase6c.sh AE_PID > runs_r3/pipeline6c.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1
mkdir -p runs_r3

AE_PID=${1:-}
AE_KILL_AT=$(date -d '13:50 today' +%s)   # protect the downstream schedule
GPT_DEADLINE=$(date -d '15:10 today' +%s)
FLAGSHIP_START_BY=$(date -d '15:30 today' +%s)
SHOWCASE_START_BY=$(date -d '16:00 today' +%s)
PROBE_START_BY=$(date -d '16:10 today' +%s)
GATE_START_BY=$(date -d '15:50 today' +%s)
CHIP_FREE_BY=$(date -d '16:40 today' +%s)

if [ -n "$AE_PID" ]; then
  while kill -0 "$AE_PID" 2>/dev/null; do
    if [ "$(date +%s)" -ge "$AE_KILL_AT" ]; then
      echo "[pipeline6c] ae_run past deadline; stopping pid $AE_PID (rolling ckpts keep the weights)"
      kill "$AE_PID" 2>/dev/null
      sleep 120
      break
    fi
    echo "[pipeline6c] waiting for ae_run (pid $AE_PID) at $(date)"
    sleep 180
  done
fi

echo "[pipeline6c] probing chip health ..."
until timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
y = jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))
print('chip ok:', float(np.asarray(y)))
" > /dev/null 2>&1; do
  echo "[pipeline6c] chip unresponsive at $(date); retrying in 60s"
  sleep 60
done
echo "[pipeline6c] chip healthy at $(date)"

run_stage() {
  name=$1; shift
  echo "[pipeline6c] === $name start $(date) ==="
  timeout "$@" >> "runs_r3/${name}.log" 2>&1
  rc=$?
  echo "[pipeline6c] === $name exit $rc $(date) ==="
}

budget() {
  local now left
  now=$(date +%s)
  left=$(( $1 - now ))
  [ "$left" -lt 60 ] && left=60
  [ "$left" -gt "$2" ] && left=$2
  echo "$left"
}

run_stage gpt_run "$(budget "$GPT_DEADLINE" 5400)" \
  python scripts/train_sustained_r3.py --phase gpt --n-iter 300
run_stage trainrun_summary 600 python scripts/train_sustained_r3.py --summary

if [ "$(date +%s)" -lt "$FLAGSHIP_START_BY" ]; then
  run_stage flagship "$(budget "$SHOWCASE_START_BY" 5400)" python scripts/flagship_configs_r3.py
else
  echo "[pipeline6c] SKIP flagship (past deadline)"
fi

# Phase-4 trained-weight showcase (generate + offline metrics + contact sheet).
if [ "$(date +%s)" -lt "$SHOWCASE_START_BY" ]; then
  bash scripts/r3_phase4.sh >> runs_r3/pipeline4.log 2>&1
else
  echo "[pipeline6c] SKIP showcase (past deadline)"
fi

if [ "$(date +%s)" -lt "$PROBE_START_BY" ]; then
  run_stage probe13 "$(budget "$CHIP_FREE_BY" 1800)" python scripts/perf_probe13.py
else
  echo "[pipeline6c] SKIP probe13 (past deadline)"
fi
if [ "$(date +%s)" -lt "$GATE_START_BY" ]; then
  run_stage int8_gate "$(budget "$CHIP_FREE_BY" 3600)" python scripts/int8_gate_r3.py
else
  echo "[pipeline6c] SKIP int8_gate (past deadline)"
fi
if [ "$(date +%s)" -lt "$GATE_START_BY" ]; then
  run_stage batch_scaling "$(budget "$CHIP_FREE_BY" 3600)" python scripts/batch_scaling_r3.py
else
  echo "[pipeline6c] SKIP batch_scaling (past deadline)"
fi

echo "[pipeline6c] all stages done $(date)"
