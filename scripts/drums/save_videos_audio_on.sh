#!/bin/bash
# 45-frame 128px audio-conditioned rollouts (sliding-window generation)
python -m ccvs_tpu.cli generate --preset drums --name save_videos_audio_on_drums \
  --ae-ckpt runs/checkpoints/frame_autoencoder_drums \
  --gpt-ckpt runs/checkpoints/transformer_audio_drums \
  --stft-ckpt runs/checkpoints/stft_autoencoder_drums --n-batches 100 "$@"
