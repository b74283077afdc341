#!/bin/bash
# point-to-point 16-frame 64px rollouts: first+last frames given
# (reference scripts/kinetics/save_videos_p2p.sh)
python -m ccvs_tpu.cli generate --preset kinetics600_p2p --name save_videos_p2p_kinetics600 \
  --ae-ckpt runs/checkpoints/frame_autoencoder_kinetics \
  --gpt-ckpt runs/checkpoints/transformer_p2p_kinetics --n-batches 78 "$@"
