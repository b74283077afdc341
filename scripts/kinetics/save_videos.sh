#!/bin/bash
# 16-frame 64px rollouts from 5 context frames, 78 batches x 16 (FVD protocol)
python -m ccvs_tpu.cli generate --preset kinetics600 --name save_videos_kinetics \
  --ae-ckpt runs/checkpoints/frame_autoencoder_kinetics \
  --gpt-ckpt runs/checkpoints/transformer_kinetics --n-batches 78 "$@"
