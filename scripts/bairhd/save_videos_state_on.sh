#!/bin/bash
# 16-frame 256px rollouts conditioned on the TRUE arm-state stream
# (reference scripts/bairhd/save_videos_state_on.sh: --keep_state + state net)
python -m ccvs_tpu.cli generate --preset bairhd_state --name save_videos_state_on_bairhd \
  --ae-ckpt runs/checkpoints/frame_autoencoder_bairhd \
  --gpt-ckpt runs/checkpoints/transformer_state_bairhd \
  --state-ckpt runs/checkpoints/state_estimator_bairhd \
  --keep-state --n-batches 640 "$@"
