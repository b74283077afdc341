#!/bin/bash
# TPU-native equivalent of reference scripts/bairhd/train_frame_autoencoder.sh
python -m ccvs_tpu.cli train-ae --preset bairhd --name frame_autoencoder_bairhd "$@"
