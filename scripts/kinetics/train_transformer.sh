#!/bin/bash
python -m ccvs_tpu.cli train-transformer --preset kinetics600 --name transformer_kinetics \
  --ae-ckpt runs/checkpoints/frame_autoencoder_kinetics "$@"
