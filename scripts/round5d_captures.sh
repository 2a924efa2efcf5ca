#!/bin/bash
# Round-5 fourth-wave real-chip captures (train-step depth):
#   1. TRAIN_LEGS_r05.json -- leg decomposition of the 7B QLoRA step
#      (sam_encode_fwd / loss_fwd / bwd+update attribution)
#   2. TRAIN_SAMINT8_r05.json -- same step with the frozen SAM encoder in
#      the serving int8 layout (QLoRA treatment extended to the vision
#      tower); a measured negative result is acceptable and recorded.
set -u
cd "$(dirname "$0")/.."

probe_tunnel() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda x: (x*2).sum())(jnp.ones(8))))" >/dev/null 2>&1
}

echo "[captures] probing tunnel..." >&2
if ! probe_tunnel; then
  echo "[captures] tunnel DOWN -- aborting" >&2
  exit 2
fi
echo "[captures] tunnel healthy" >&2

echo "[captures] 1/2 7B QLoRA train legs" >&2
PROBE_INT8=1 PROBE_LEGS=1 PROBE_REPEATS=3 PROBE_STEPS=16 \
  PROBE_OUT=TRAIN_LEGS_r05.json timeout 4000 python scripts/train_step_probe.py \
  > /tmp/train_legs_r05.json 2>/tmp/train_legs_r05.err \
  && echo "[captures] train legs ok" >&2 \
  || echo "[captures] train legs FAILED (see /tmp/train_legs_r05.err)" >&2

echo "[captures] 2/2 7B QLoRA + int8 frozen SAM" >&2
PROBE_INT8=1 PROBE_SAM_INT8=1 PROBE_REPEATS=3 PROBE_STEPS=16 \
  PROBE_OUT=TRAIN_SAMINT8_r05.json timeout 4000 python scripts/train_step_probe.py \
  > /tmp/train_samint8_r05.json 2>/tmp/train_samint8_r05.err \
  && echo "[captures] train sam-int8 ok" >&2 \
  || echo "[captures] train sam-int8 FAILED (see /tmp/train_samint8_r05.err)" >&2
echo "[captures] done $(date -u +%H:%M:%S)" >&2
