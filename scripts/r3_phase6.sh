#!/bin/bash
# Round-3 chip queue, part 6: rebuild the trained checkpoints lost to the VM
# reboot (they were gitignored), then the trained-weight stages.
#   probe13 (w4a8 sweep) -> phase-A AE retrain (400 it) -> phase-B GPT (300 it)
#   -> TRAINRUN summary -> int8 gate refresh -> phase-4 trained-weight showcase
#   -> serving batch-scaling study.
# Launch detached:  nohup bash scripts/r3_phase6.sh > runs_r3/pipeline6.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1
mkdir -p runs_r3

# Wait for the part-5 queue (bench + flagship) to release the chip.
if [ -f /tmp/pipeline5.pid ]; then
  P5=$(cat /tmp/pipeline5.pid)
  while kill -0 "$P5" 2>/dev/null; do
    echo "[pipeline6] waiting for pipeline5 (pid $P5) at $(date)"
    sleep 120
  done
fi

echo "[pipeline6] probing chip health ..."
until timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
y = jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))
print('chip ok:', float(np.asarray(y)))
" > /dev/null 2>&1; do
  echo "[pipeline6] chip unresponsive at $(date); retrying in 60s"
  sleep 60
done
echo "[pipeline6] chip healthy at $(date)"

run_stage() {
  name=$1; shift
  echo "[pipeline6] === $name start $(date) ==="
  timeout "$@" >> "runs_r3/${name}.log" 2>&1
  rc=$?
  echo "[pipeline6] === $name exit $rc $(date) ==="
}

run_stage probe13 1800 python scripts/perf_probe13.py

# Phase A: fresh run (checkpoints gone); resume-capable on retry. The
# metrics jsonl is opened in append mode, so rotate the previous run's logs
# (they live on in git history) before a FRESH run to keep the summary clean.
if [ -d runs_r3/checkpoints/r3_ae_sustained ]; then
  run_stage ae_run 28800 python scripts/train_sustained_r3.py --phase ae --n-iter 400 --resume
else
  rm -rf runs_r3/logs/r3_ae_sustained runs_r3/logs/r3_gpt_sustained
  run_stage ae_run 28800 python scripts/train_sustained_r3.py --phase ae --n-iter 400
fi
run_stage gpt_run 5400 python scripts/train_sustained_r3.py --phase gpt --n-iter 300
run_stage trainrun_summary 600 python scripts/train_sustained_r3.py --summary
run_stage int8_gate 3600 python scripts/int8_gate_r3.py

# Phase-4 trained-weight showcase (generate + offline metrics + contact sheet).
bash scripts/r3_phase4.sh >> runs_r3/pipeline4.log 2>&1

run_stage batch_scaling 3600 python scripts/batch_scaling_r3.py

echo "[pipeline6] all stages done $(date)"
