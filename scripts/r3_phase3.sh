#!/bin/bash
# Round-3 chip queue, part 3: wait out the tunnel outage, then resume
# phase-B training and run the remaining trained-weight + perf stages.
# Launch detached:  nohup bash scripts/r3_phase3.sh > runs_r3/pipeline3.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1
mkdir -p runs_r3

echo "[pipeline3] probing chip health ..."
until timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
y = jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))
print('chip ok:', float(np.asarray(y)))
" > /dev/null 2>&1; do
  echo "[pipeline3] chip unresponsive at $(date); retrying in 60s"
  sleep 60
done
echo "[pipeline3] chip healthy at $(date)"

run_stage() {
  name=$1; shift
  echo "[pipeline3] === $name start $(date) ==="
  timeout "$@" >> "runs_r3/${name}.log" 2>&1
  rc=$?
  echo "[pipeline3] === $name exit $rc $(date) ==="
}

run_stage gpt_run 5400 python scripts/train_sustained_r3.py --phase gpt --n-iter 250 --resume
run_stage trainrun_summary 600 python scripts/train_sustained_r3.py --summary
run_stage int8_gate 3600 python scripts/int8_gate_r3.py
run_stage bench 3600 python bench.py
run_stage flagship 5400 python scripts/flagship_configs_r3.py
run_stage probe13 1800 python scripts/perf_probe13.py
run_stage batch_scaling 3600 python scripts/batch_scaling_r3.py

echo "[pipeline3] all stages done $(date)"
