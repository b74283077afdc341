#!/bin/bash
# 16-frame 256px rollouts from 1 context frame, 640 batches x batch 2 (FVD protocol)
python -m ccvs_tpu.cli generate --preset bairhd --name save_videos_state_off_bairhd \
  --ae-ckpt runs/checkpoints/frame_autoencoder_bairhd \
  --gpt-ckpt runs/checkpoints/transformer_bairhd --n-batches 640 "$@"
