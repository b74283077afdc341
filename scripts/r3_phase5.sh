#!/bin/bash
# Round-3 chip queue, part 5 (fresh VM after reboot; gitignored checkpoints
# from parts 1-3 are gone). Short measurement stages first: current bench
# state and the two non-BAIR flagship configs (VERDICT round-2 item 6).
# Launch detached:  nohup bash scripts/r3_phase5.sh > runs_r3/pipeline5.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1
mkdir -p runs_r3

echo "[pipeline5] probing chip health ..."
until timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
y = jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))
print('chip ok:', float(np.asarray(y)))
" > /dev/null 2>&1; do
  echo "[pipeline5] chip unresponsive at $(date); retrying in 60s"
  sleep 60
done
echo "[pipeline5] chip healthy at $(date)"

run_stage() {
  name=$1; shift
  echo "[pipeline5] === $name start $(date) ==="
  timeout "$@" >> "runs_r3/${name}.log" 2>&1
  rc=$?
  echo "[pipeline5] === $name exit $rc $(date) ==="
}

run_stage bench_r3_status 3600 python bench.py
run_stage flagship 5400 python scripts/flagship_configs_r3.py

echo "[pipeline5] all stages done $(date)"
