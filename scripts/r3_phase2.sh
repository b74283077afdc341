#!/bin/bash
# Round-3 chip queue, part 2: phase-B GPT training (remat fix) + the stages
# that want its trained weights, then the perf stages.
# Launch detached:  nohup bash scripts/r3_phase2.sh > runs_r3/pipeline2.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1
mkdir -p runs_r3

run_stage() {
  name=$1; shift
  echo "[pipeline2] === $name start $(date) ==="
  timeout "$@" >> "runs_r3/${name}.log" 2>&1
  rc=$?
  echo "[pipeline2] === $name exit $rc $(date) ==="
}

run_stage gpt_run 7200 python scripts/train_sustained_r3.py --phase gpt --n-iter 250
run_stage trainrun_summary 600 python scripts/train_sustained_r3.py --summary
run_stage int8_gate 3600 python scripts/int8_gate_r3.py
run_stage probe13 1800 python scripts/perf_probe13.py
run_stage flagship 5400 python scripts/flagship_configs_r3.py
run_stage bench 3600 python bench.py
run_stage batch_scaling 3600 python scripts/batch_scaling_r3.py

echo "[pipeline2] all stages done $(date)"
