#!/bin/bash
python -m ccvs_tpu.cli generate --preset ucf101 --name save_videos_ucf101 \
  --ae-ckpt runs/checkpoints/frame_autoencoder_ucf101 \
  --gpt-ckpt runs/checkpoints/transformer_ucf101 --n-batches 500 "$@"
