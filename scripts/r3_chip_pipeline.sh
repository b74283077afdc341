#!/bin/bash
# Round-3 chip pipeline: runs after the sustained AE run frees the chip.
# Launch detached:  nohup bash scripts/r3_chip_pipeline.sh > runs_r3/pipeline.log 2>&1 &
# Every stage logs to runs_r3/ and tolerates individual failure (set +e per
# stage) so one crash doesn't strand the rest of the queue.

cd "$(dirname "$0")/.." || exit 1
mkdir -p runs_r3

echo "[pipeline] waiting for AE run (pid file /tmp/ae_run.pid) ..."
while [ -f /tmp/ae_run.pid ] && kill -0 "$(cat /tmp/ae_run.pid)" 2>/dev/null; do
  sleep 60
done
echo "[pipeline] AE run finished at $(date)"

run_stage() {
  name=$1; shift
  echo "[pipeline] === $name start $(date) ==="
  timeout "$@" >> "runs_r3/${name}.log" 2>&1
  rc=$?
  echo "[pipeline] === $name exit $rc $(date) ==="
}

# Phase B: latent transformer on the frozen phase-A AE (bounded at 2h;
# checkpoints roll every 50 iters so a timeout still leaves an artifact).
run_stage gpt_run 7200 python scripts/train_sustained_r3.py --phase gpt --n-iter 250

# Training-run summary table -> TRAINRUN.md
run_stage trainrun_summary 600 python scripts/train_sustained_r3.py --summary

# Quality+speed gate for the int8 GPT serving path (trained weights now
# exist). The decoder-quant gate stage that used to run here was removed
# with its serving paths (gate-measured slower; runs_r3/dec_quant_gate.json
# is the retained artifact).
run_stage int8_gate 3600 python scripts/int8_gate_r3.py

# w4a8 probe
run_stage probe13 1800 python scripts/perf_probe13.py

# Other two flagship configs, timed
run_stage flagship 5400 python scripts/flagship_configs_r3.py

# Fresh bench under the final code state
run_stage bench 3600 python bench.py

# Serving batch-scaling study (B=1/2/4)
run_stage batch_scaling 3600 python scripts/batch_scaling_r3.py

echo "[pipeline] all stages done $(date)"
