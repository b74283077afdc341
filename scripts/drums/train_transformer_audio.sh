#!/bin/bash
python -m ccvs_tpu.cli train-transformer --preset drums --name transformer_audio_drums \
  --ae-ckpt runs/checkpoints/frame_autoencoder_drums "$@"
