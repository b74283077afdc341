#!/bin/bash
python -m ccvs_tpu.cli train-ae --preset ucf101 --name frame_autoencoder_ucf101 "$@"
