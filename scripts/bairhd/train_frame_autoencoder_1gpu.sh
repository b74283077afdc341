#!/bin/bash
# TPU-native equivalent of reference scripts/bairhd/train_frame_autoencoder_1gpu.sh
# (same config as the 4-GPU launcher, restricted to one accelerator).
python -m ccvs_tpu.cli train-ae --preset bairhd --name frame_autoencoder_bairhd --n-devices 1 "$@"
