#!/bin/bash
python -m ccvs_tpu.cli train-transformer --preset bairhd --name transformer_bairhd \
  --ae-ckpt runs/checkpoints/frame_autoencoder_bairhd "$@"
