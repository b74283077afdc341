#!/bin/bash
python -m ccvs_tpu.cli train-transformer --preset bairhd_unc --name transformer_unc_bairhd \
  --ae-ckpt runs/checkpoints/frame_autoencoder_bairhd "$@"
