#!/bin/bash
python -m ccvs_tpu.cli train-transformer --preset ucf101 --name transformer_ucf101 \
  --ae-ckpt runs/checkpoints/frame_autoencoder_ucf101 "$@"
