#!/bin/bash
python -m ccvs_tpu.cli train-stft --preset drums --name stft_autoencoder_drums "$@"
