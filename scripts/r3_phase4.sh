#!/bin/bash
# Round-3 chip queue, part 4: trained-weight showcase through the REAL CLI.
# Generates videos from the sustained-run checkpoints (phase-A AE + phase-B
# GPT), evaluates them with the offline metric drivers, and renders a
# real/fake/rec contact sheet — the reference's end-to-end user journey
# (train -> save_videos -> tools metrics, scripts/bairhd/save_videos_state_off.sh
# + tools/pytorch_metrics/metrics.py) exercised on trained TPU checkpoints.
# Launch detached:  nohup bash scripts/r3_phase4.sh > runs_r3/pipeline4.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1
mkdir -p runs_r3

# Wait for the part-3 queue (training resume + gates + bench) to release the chip.
if [ -f /tmp/pipeline3.pid ]; then
  P3=$(cat /tmp/pipeline3.pid)
  while kill -0 "$P3" 2>/dev/null; do
    echo "[pipeline4] waiting for pipeline3 (pid $P3) at $(date)"
    sleep 120
  done
fi

echo "[pipeline4] probing chip health ..."
until timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
y = jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))
print('chip ok:', float(np.asarray(y)))
" > /dev/null 2>&1; do
  echo "[pipeline4] chip unresponsive at $(date); retrying in 60s"
  sleep 60
done
echo "[pipeline4] chip healthy at $(date)"

run_stage() {
  name=$1; shift
  echo "[pipeline4] === $name start $(date) ==="
  timeout "$@" >> "runs_r3/${name}.log" 2>&1
  rc=$?
  echo "[pipeline4] === $name exit $rc $(date) ==="
}

# 16 videos (4 batches x batch_size_vid 4) from held-out synthetic clips,
# raw-G AE weights (400-iter EMA is still mostly init, TRAINRUN.md).
run_stage trained_generate 3600 python -m ccvs_tpu.cli generate \
  --load-config runs_r3/checkpoints/r3_gpt_sustained/config.json \
  --ae-ckpt runs_r3/checkpoints/r3_ae_sustained --ae-raw \
  --gpt-ckpt runs_r3/checkpoints/r3_gpt_sustained \
  --name r3_trained_generate --n-batches 4

RES=runs_r3/results/r3_trained_generate
run_stage trained_eval_rec 1800 python -m ccvs_tpu.cli eval-metrics \
  --real "$RES/real" --fake "$RES/rec"
run_stage trained_eval_fake 1800 python -m ccvs_tpu.cli eval-metrics \
  --real "$RES/real" --fake "$RES/fake"
run_stage trained_fvd 1800 python -m ccvs_tpu.cli eval-fvd \
  --real "$RES/real" --fake "$RES/fake" --chunk 16

# Contact sheet: real / rec / fake rows, 8 frames each, first held-out video.
run_stage trained_sheet 600 python - <<'EOF'
import numpy as np
from PIL import Image
from ccvs_tpu.utils.video_io import read_video

rows = []
for name in ("real", "rec", "fake"):
    vid = read_video(f"runs_r3/results/r3_trained_generate/{name}/vid_00000.avi")
    rows.append(np.concatenate(list(vid[::2][:8]), axis=1))
sheet = np.concatenate(rows, axis=0)
Image.fromarray(sheet).save("runs_r3/trained_generate_sheet.png")
print("sheet:", sheet.shape)
EOF

echo "[pipeline4] all stages done $(date)"
