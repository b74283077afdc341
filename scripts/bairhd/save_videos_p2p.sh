#!/bin/bash
python -m ccvs_tpu.cli generate --preset bairhd_p2p --name save_videos_p2p_bairhd \
  --ae-ckpt runs/checkpoints/frame_autoencoder_bairhd \
  --gpt-ckpt runs/checkpoints/transformer_p2p_bairhd --n-batches 640 "$@"
