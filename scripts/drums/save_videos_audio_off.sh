#!/bin/bash
# 45-frame 128px rollouts with the audio stream SAMPLED instead of given
# (reference scripts/drums/save_videos_audio_off.sh: --x_sample_state, no stft
# conditioning) -- omit --stft-ckpt so the generator samples the state tokens
python -m ccvs_tpu.cli generate --preset drums --name save_videos_audio_off_drums \
  --ae-ckpt runs/checkpoints/frame_autoencoder_drums \
  --gpt-ckpt runs/checkpoints/transformer_audio_drums \
  --n-batches 50 "$@"
