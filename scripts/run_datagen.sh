#!/bin/bash
# Offline data generation (reference scripts/run_datagen.sh ->
# preprocess_data/generate_* drivers). Each recipe writes the on-disk tree
# the matching dataset class consumes. See
# `python -m interactvlm_tpu.datagen --help` for input formats.
set -e
RECIPE=${1:-damon}
shift || true

python -m interactvlm_tpu.datagen "$RECIPE" "$@"
