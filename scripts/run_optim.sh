#!/bin/bash
# Joint human-object fitting (reference scripts/run_optim.sh).
set -e
python -m interactvlm_tpu.fit.data_io --input_path "$1" "${@:2}"
