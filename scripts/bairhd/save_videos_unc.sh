#!/bin/bash
python -m ccvs_tpu.cli generate --preset bairhd_unc --name save_videos_unc_bairhd \
  --ae-ckpt runs/checkpoints/frame_autoencoder_bairhd \
  --gpt-ckpt runs/checkpoints/transformer_unc_bairhd --n-batches 640 "$@"
