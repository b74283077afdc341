#!/bin/bash
python -m ccvs_tpu.cli train-ae --preset kinetics600 --name frame_autoencoder_kinetics "$@"
