#!/bin/bash
# Round-5 second-wave real-chip captures:
#   1. BENCH_7B_INT4_b64.json    -- 7B int4 cached serving at Bc=64 (int4
#      frees ~3 GiB of weights vs int8; the decode weight-read leg is the
#      only per-image cost that amortizes with Bc, so doubling the cache
#      batch past the int8 ceiling of 32 should buy ~20% e2e).
#      Fallback Bc=48 if 64 OOMs.
#   2. BENCH_13B_INT4_stream.json -- 13B int4 STREAMING at B=4. int8 13B
#      streaming needs TP-2 (weights 12.3 GiB + encode temps > HBM);
#      int4 halves the weights (6.3 GiB), which may unblock single-chip
#      streaming at B=4. Fallback B=2.
# Each step logs to stderr and continues on failure.
set -u
cd "$(dirname "$0")/.."

probe_tunnel() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda x: (x*2).sum())(jnp.ones(8))))" >/dev/null 2>&1
}

echo "[captures] probing tunnel..." >&2
if ! probe_tunnel; then
  echo "[captures] tunnel DOWN -- aborting" >&2
  exit 2
fi
echo "[captures] tunnel healthy" >&2

echo "[captures] 1/2 7B int4 cached Bc=64" >&2
BENCH_WQ=int4 BENCH_CACHE_BATCH=64 timeout 4000 python bench.py \
  > /tmp/bench_7b_int4_b64.json 2>/tmp/bench_7b_int4_b64.err \
  && cp /tmp/bench_7b_int4_b64.json BENCH_7B_INT4_b64.json \
  && echo "[captures] 7B int4 Bc=64 ok" >&2 \
  || { echo "[captures] 7B int4 Bc=64 FAILED (see err); trying Bc=48" >&2;
       BENCH_WQ=int4 BENCH_CACHE_BATCH=48 timeout 4000 python bench.py \
         > /tmp/bench_7b_int4_b48.json 2>/tmp/bench_7b_int4_b48.err \
         && cp /tmp/bench_7b_int4_b48.json BENCH_7B_INT4_b48.json \
         && echo "[captures] 7B int4 Bc=48 ok" >&2 \
         || echo "[captures] 7B int4 Bc=48 FAILED too" >&2; }

echo "[captures] 2/2 13B int4 streaming B=4 (cached Bc=16 rides along)" >&2
BENCH_LLAMA=13b BENCH_BATCH=4 BENCH_WQ=int4 BENCH_CACHE_BATCH=16 \
  BENCH_STREAMING=1 timeout 4000 python bench.py \
  > /tmp/bench_13b_int4_stream.json 2>/tmp/bench_13b_int4_stream.err \
  && cp /tmp/bench_13b_int4_stream.json BENCH_13B_INT4_stream.json \
  && echo "[captures] 13B int4 streaming B=4 ok" >&2 \
  || { echo "[captures] 13B int4 streaming B=4 FAILED; trying B=2" >&2;
       BENCH_LLAMA=13b BENCH_BATCH=2 BENCH_WQ=int4 BENCH_CACHE_BATCH=16 \
         BENCH_STREAMING=1 timeout 4000 python bench.py \
         > /tmp/bench_13b_int4_stream_b2.json 2>/tmp/bench_13b_int4_stream_b2.err \
         && cp /tmp/bench_13b_int4_stream_b2.json BENCH_13B_INT4_stream_b2.json \
         && echo "[captures] 13B int4 streaming B=2 ok" >&2 \
         || echo "[captures] 13B int4 streaming FAILED at B=2 too" >&2; }

echo "[captures] done" >&2
