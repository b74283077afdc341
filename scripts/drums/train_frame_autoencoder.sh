#!/bin/bash
python -m ccvs_tpu.cli train-ae --preset drums --name frame_autoencoder_drums "$@"
