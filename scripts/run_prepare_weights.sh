#!/bin/bash
# LoRA merge + inference export (reference run_prepare_weights.sh).
set -e
python -m interactvlm_tpu.train.export --run_dir "$1" --out_dir "$2"
