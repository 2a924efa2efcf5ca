#!/bin/bash
# Evaluation (reference scripts/run_eval.sh): generate-mode validation +
# DAMON reports. Usage: bash scripts/run_eval.sh <run_dir> [args...]
set -e
RUN_DIR=$1; shift
python -m interactvlm_tpu.eval.evaluate --run_dir "$RUN_DIR" "$@"
