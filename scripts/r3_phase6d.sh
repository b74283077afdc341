#!/bin/bash
# Round-3 chip queue, part 6d (replaces 6b/6c after the 07:50 hang): the
# post-reboot retrain + trained-weight stages, now with a STALL WATCHDOG —
# the 06:47 ae_run launch blocked forever on a wedged tunnel RPC (0 CPU,
# empty metrics for >60 min), so every long stage is now monitored for
# progress-file growth and killed+retried (with --resume) when it stalls.
#   ae_run (300 it) -> gpt_run (300 it) -> TRAINRUN summary
#   -> flagship rerun (drums window fix) -> phase-4 trained-weight showcase
#   -> [optional] int8 gate refresh -> [optional] batch scaling.
# Launch detached:  nohup bash scripts/r3_phase6d.sh > runs_r3/pipeline6d.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1
mkdir -p runs_r3

AE_DEADLINE=$(date -d '13:30 today' +%s)      # ae_run must END by here
GPT_DEADLINE=$(date -d '14:50 today' +%s)
FLAGSHIP_START_BY=$(date -d '15:20 today' +%s)
SHOWCASE_START_BY=$(date -d '15:50 today' +%s)
GATE_START_BY=$(date -d '15:45 today' +%s)
CHIP_FREE_BY=$(date -d '16:30 today' +%s)

probe_chip() {
  until timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
y = jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))
print('chip ok:', float(np.asarray(y)))
" > /dev/null 2>&1; do
    echo "[p6d] chip unresponsive at $(date); retrying in 60s"
    sleep 60
  done
  echo "[p6d] chip healthy at $(date)"
}

run_stage() {
  name=$1; shift
  echo "[p6d] === $name start $(date) ==="
  timeout "$@" >> "runs_r3/${name}.log" 2>&1
  rc=$?
  echo "[p6d] === $name exit $rc $(date) ==="
}

# run_watched name progress_file hard_timeout cmd...
# Kills the stage if progress_file stops growing for 15 min after a 30-min
# compile grace period (tunnel RPCs can hang forever; metrics.jsonl is
# flushed every log event, every 10 iters).
run_watched() {
  local name=$1 pfile=$2 tmo=$3; shift 3
  echo "[p6d] === $name start $(date) (watched: $pfile) ==="
  timeout "$tmo" "$@" >> "runs_r3/${name}.log" 2>&1 &
  local pid=$! elapsed=0 sz1 sz2
  sleep 1800 & local sl=$!           # compile grace
  while kill -0 "$pid" 2>/dev/null && kill -0 "$sl" 2>/dev/null; do sleep 30; done
  kill "$sl" 2>/dev/null
  while kill -0 "$pid" 2>/dev/null; do
    sz1=$(stat -c %s "$pfile" 2>/dev/null || echo 0)
    for i in $(seq 30); do kill -0 "$pid" 2>/dev/null || break; sleep 30; done
    kill -0 "$pid" 2>/dev/null || break
    sz2=$(stat -c %s "$pfile" 2>/dev/null || echo 0)
    if [ "$sz1" = "$sz2" ]; then
      echo "[p6d] $name STALLED (no growth of $pfile in 15 min); killing pid $pid"
      kill "$pid" 2>/dev/null; sleep 30; kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      echo "[p6d] === $name exit STALL $(date) ==="
      return 99
    fi
  done
  wait "$pid"; local rc=$?
  echo "[p6d] === $name exit $rc $(date) ==="
  return "$rc"
}

budget() {
  local now left
  now=$(date +%s)
  left=$(( $1 - now ))
  [ "$left" -lt 60 ] && left=60
  [ "$left" -gt "$2" ] && left=$2
  echo "$left"
}

probe_chip

# ---- Phase A retrain (fresh: reboot lost the gitignored checkpoints; the
# committed 400-iter TRAINRUN curves live in git history). Up to 3 attempts,
# resuming from the 50-iter rolling checkpoint after the first.
AE_METRICS=runs_r3/logs/r3_ae_sustained/metrics.jsonl
rm -rf runs_r3/logs/r3_ae_sustained runs_r3/logs/r3_gpt_sustained
AE_ARGS=()
for attempt in 1 2 3; do
  [ "$(date +%s)" -ge "$AE_DEADLINE" ] && break
  run_watched ae_run "$AE_METRICS" "$(budget "$AE_DEADLINE" 21600)" \
    python scripts/train_sustained_r3.py --phase ae --n-iter 300 "${AE_ARGS[@]}"
  rc=$?
  [ "$rc" -eq 0 ] && break
  [ -d runs_r3/checkpoints/r3_ae_sustained ] && AE_ARGS=(--resume)
  probe_chip
done

# ---- Phase B (needs the phase-A checkpoint)
GPT_METRICS=runs_r3/logs/r3_gpt_sustained/metrics.jsonl
GPT_ARGS=()
for attempt in 1 2 3; do
  [ "$(date +%s)" -ge "$GPT_DEADLINE" ] && break
  run_watched gpt_run "$GPT_METRICS" "$(budget "$GPT_DEADLINE" 7200)" \
    python scripts/train_sustained_r3.py --phase gpt --n-iter 300 "${GPT_ARGS[@]}"
  rc=$?
  [ "$rc" -eq 0 ] && break
  [ -d runs_r3/checkpoints/r3_gpt_sustained ] && GPT_ARGS=(--resume)
  probe_chip
done

run_stage trainrun_summary 600 python scripts/train_sustained_r3.py --summary

# ---- Flagship configs rerun (kinetics + drums; drums window fix in place,
# results persisted per-config so a late crash keeps the earlier number).
if [ "$(date +%s)" -lt "$FLAGSHIP_START_BY" ]; then
  run_stage flagship "$(budget "$SHOWCASE_START_BY" 5400)" \
    python scripts/flagship_configs_r3.py
else
  echo "[p6d] SKIP flagship (past deadline)"
fi

# ---- Phase-4 trained-weight showcase (generate + offline metrics + sheet)
if [ "$(date +%s)" -lt "$SHOWCASE_START_BY" ]; then
  bash scripts/r3_phase4.sh >> runs_r3/pipeline4.log 2>&1
else
  echo "[p6d] SKIP showcase (past deadline)"
fi

# ---- Optional tails (committed gate artifact already valid)
if [ "$(date +%s)" -lt "$GATE_START_BY" ]; then
  run_stage int8_gate "$(budget "$CHIP_FREE_BY" 3600)" python scripts/int8_gate_r3.py
else
  echo "[p6d] SKIP int8_gate (past deadline)"
fi
if [ "$(date +%s)" -lt "$GATE_START_BY" ]; then
  run_stage batch_scaling "$(budget "$CHIP_FREE_BY" 3600)" python scripts/batch_scaling_r3.py
else
  echo "[p6d] SKIP batch_scaling (past deadline)"
fi

echo "[p6d] all stages done $(date)"
