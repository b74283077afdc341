#!/bin/bash
python -m ccvs_tpu.cli train-state --preset bairhd_state --name state_estimator_bairhd \
  --ae-ckpt runs/checkpoints/frame_autoencoder_bairhd "$@"
