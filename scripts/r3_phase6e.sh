#!/bin/bash
# Round-3 chip queue, part 6e (replaces 6d): same stage list, SMARTER
# watchdog. 6d killed on metrics-file staleness alone, which would have
# false-killed the in-flight AE first compile (35+ min through the tunnel,
# actively tracing). A stage is now killed only when its progress file AND
# the python process's CPU time both stop advancing for 15 min — the 06:47
# hang signature (blocked forever on a wedged tunnel RPC at 0 CPU), not the
# slow-compile signature.
#   [adopt running ae_run] -> retry-to-completion ae (300 it) -> gpt (300 it)
#   -> TRAINRUN summary -> flagship rerun -> phase-4 showcase
#   -> [optional] int8 gate refresh -> [optional] batch scaling.
# Launch detached:  nohup bash scripts/r3_phase6e.sh AE_PID > runs_r3/pipeline6e.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1
mkdir -p runs_r3

ADOPTED_AE_PID=${1:-}

AE_DEADLINE=$(date -d '13:30 today' +%s)
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
    echo "[p6e] chip unresponsive at $(date); retrying in 60s"
    sleep 60
  done
  echo "[p6e] chip healthy at $(date)"
}

run_stage() {
  name=$1; shift
  echo "[p6e] === $name start $(date) ==="
  timeout "$@" >> "runs_r3/${name}.log" 2>&1
  rc=$?
  echo "[p6e] === $name exit $rc $(date) ==="
}

cputime() {  # total utime+stime jiffies of pid $1 (0 if gone)
  awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo 0
}

# watch_pid pid progress_file  — waits for pid; kills it only if BOTH the
# progress file size and the cpu time are frozen across a 15-min window.
watch_pid() {
  local pid=$1 pfile=$2 sz1 sz2 ct1 ct2
  while kill -0 "$pid" 2>/dev/null; do
    sz1=$(stat -c %s "$pfile" 2>/dev/null || echo 0); ct1=$(cputime "$pid")
    for i in $(seq 30); do kill -0 "$pid" 2>/dev/null || return 0; sleep 30; done
    sz2=$(stat -c %s "$pfile" 2>/dev/null || echo 0); ct2=$(cputime "$pid")
    if [ "$sz1" = "$sz2" ] && [ "$ct1" = "$ct2" ]; then
      echo "[p6e] pid $pid WEDGED (file + cpu frozen 15 min); killing"
      kill "$pid" 2>/dev/null; sleep 30; kill -9 "$pid" 2>/dev/null
      return 99
    fi
  done
}

# run_watched name progress_file hard_timeout cmd...
run_watched() {
  local name=$1 pfile=$2 tmo=$3; shift 3
  echo "[p6e] === $name start $(date) (watched: $pfile) ==="
  timeout "$tmo" "$@" >> "runs_r3/${name}.log" 2>&1 &
  local pid=$!
  watch_pid "$pid" "$pfile"
  wait "$pid" 2>/dev/null; local rc=$?
  echo "[p6e] === $name exit $rc $(date) ==="
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

last_step() {  # last logged step in a metrics.jsonl (or -1)
  python - "$1" <<'EOF'
import json, sys, os
p = sys.argv[1]
step = -1
if os.path.exists(p):
    with open(p) as f:
        for line in f:
            try:
                step = max(step, json.loads(line).get("step", -1))
            except ValueError:
                pass
print(step)
EOF
}

AE_METRICS=runs_r3/logs/r3_ae_sustained/metrics.jsonl
GPT_METRICS=runs_r3/logs/r3_gpt_sustained/metrics.jsonl

# ---- Phase A: adopt the already-running ae_run, then retry to completion.
if [ -n "$ADOPTED_AE_PID" ] && kill -0 "$ADOPTED_AE_PID" 2>/dev/null; then
  echo "[p6e] adopting running ae_run pid $ADOPTED_AE_PID"
  watch_pid "$ADOPTED_AE_PID" "$AE_METRICS"
  echo "[p6e] adopted ae_run finished/killed at $(date)"
fi
for attempt in 1 2 3; do
  step=$(last_step "$AE_METRICS")
  echo "[p6e] ae last step: $step"
  [ "$step" -ge 299 ] && break
  [ "$(date +%s)" -ge "$AE_DEADLINE" ] && { echo "[p6e] ae deadline passed"; break; }
  probe_chip
  AE_ARGS=()
  [ -d runs_r3/checkpoints/r3_ae_sustained ] && AE_ARGS=(--resume)
  run_watched ae_run "$AE_METRICS" "$(budget "$AE_DEADLINE" 21600)" \
    python scripts/train_sustained_r3.py --phase ae --n-iter 300 "${AE_ARGS[@]}"
done

# ---- Phase B
for attempt in 1 2 3; do
  step=$(last_step "$GPT_METRICS")
  echo "[p6e] gpt last step: $step"
  [ "$step" -ge 299 ] && break
  [ "$(date +%s)" -ge "$GPT_DEADLINE" ] && { echo "[p6e] gpt deadline passed"; break; }
  probe_chip
  GPT_ARGS=()
  [ -d runs_r3/checkpoints/r3_gpt_sustained ] && GPT_ARGS=(--resume)
  run_watched gpt_run "$GPT_METRICS" "$(budget "$GPT_DEADLINE" 7200)" \
    python scripts/train_sustained_r3.py --phase gpt --n-iter 300 "${GPT_ARGS[@]}"
done

run_stage trainrun_summary 600 python scripts/train_sustained_r3.py --summary

if [ "$(date +%s)" -lt "$FLAGSHIP_START_BY" ]; then
  probe_chip
  run_stage flagship "$(budget "$SHOWCASE_START_BY" 5400)" \
    python scripts/flagship_configs_r3.py
else
  echo "[p6e] SKIP flagship (past deadline)"
fi

if [ "$(date +%s)" -lt "$SHOWCASE_START_BY" ]; then
  bash scripts/r3_phase4.sh >> runs_r3/pipeline4.log 2>&1
else
  echo "[p6e] SKIP showcase (past deadline)"
fi

if [ "$(date +%s)" -lt "$GATE_START_BY" ]; then
  run_stage int8_gate "$(budget "$CHIP_FREE_BY" 3600)" python scripts/int8_gate_r3.py
else
  echo "[p6e] SKIP int8_gate (past deadline)"
fi
if [ "$(date +%s)" -lt "$GATE_START_BY" ]; then
  run_stage batch_scaling "$(budget "$CHIP_FREE_BY" 3600)" python scripts/batch_scaling_r3.py
else
  echo "[p6e] SKIP batch_scaling (past deadline)"
fi

echo "[p6e] all stages done $(date)"
