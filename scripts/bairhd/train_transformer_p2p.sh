#!/bin/bash
python -m ccvs_tpu.cli train-transformer --preset bairhd_p2p --name transformer_p2p_bairhd \
  --ae-ckpt runs/checkpoints/frame_autoencoder_bairhd "$@"
