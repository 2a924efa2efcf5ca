#!/bin/bash
# Round-5 third-wave real-chip captures: push the 13B int4 cached batch
# past Bc=16. The calibrated cached-path budget (utils/memory.py:
# cached_serving_budget) predicts Bc=24 at 13.4 GiB and Bc=32 at 15.3 GiB
# (marginal) on the 15.75 GiB chip; decode weight reads amortize with Bc,
# so each doubling buys real img/s. Try 32, fall back to 24.
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

echo "[captures] 13B int4 cached Bc=32" >&2
BENCH_LLAMA=13b BENCH_BATCH=4 BENCH_WQ=int4 BENCH_CACHE_BATCH=32 \
  BENCH_STREAMING=0 timeout 4000 python bench.py \
  > /tmp/bench_13b_int4_b32.json 2>/tmp/bench_13b_int4_b32.err \
  && cp /tmp/bench_13b_int4_b32.json BENCH_13B_INT4_b32.json \
  && echo "[captures] 13B int4 Bc=32 ok" >&2 \
  || { echo "[captures] 13B int4 Bc=32 FAILED; trying Bc=24" >&2;
       BENCH_LLAMA=13b BENCH_BATCH=4 BENCH_WQ=int4 BENCH_CACHE_BATCH=24 \
         BENCH_STREAMING=0 timeout 4000 python bench.py \
         > /tmp/bench_13b_int4_b24.json 2>/tmp/bench_13b_int4_b24.err \
         && cp /tmp/bench_13b_int4_b24.json BENCH_13B_INT4_b24.json \
         && echo "[captures] 13B int4 Bc=24 ok" >&2 \
         || echo "[captures] 13B int4 Bc=24 FAILED too" >&2; }
echo "[captures] done" >&2
