#!/bin/bash
# Demo (reference scripts/run_demo.sh). Usage:
#   bash scripts/run_demo.sh <img_folder> <out_folder> [hcontact|oafford|...]
set -e
python -m interactvlm_tpu.demo.run_demo \
  --img_folder "$1" --output_folder "$2" --contact_type "${3:-hcontact}" \
  "${@:4}"
