#!/bin/bash
python -m ccvs_tpu.cli train-transformer --preset bairhd_state --name transformer_state_bairhd \
  --ae-ckpt runs/checkpoints/frame_autoencoder_bairhd "$@"
