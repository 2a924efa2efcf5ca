#!/bin/bash
# Wait for the axon tunnel to come back (probe every 5 min, give up after
# ~3 h), then run the round-5 second+third wave captures:
#   1. 7B int4 cached Bc=48  (Bc=64 measured OOM at 17.02 GiB)
#   2. 13B int4 streaming B=4 (+ cached Bc=16 rides along)
#   3. 13B int4 cached Bc=32 (fallback Bc=24)
set -u
cd "$(dirname "$0")/.."

probe_tunnel() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda x: (x*2).sum())(jnp.ones(8))))" >/dev/null 2>&1
}

n=0
until probe_tunnel; do
  n=$((n+1))
  echo "[wait] tunnel down (probe $n) $(date -u +%H:%M:%S)" >&2
  if [ "$n" -ge 36 ]; then
    echo "[wait] giving up after $n probes" >&2
    exit 2
  fi
  sleep 300
done
echo "[wait] tunnel healthy $(date -u +%H:%M:%S)" >&2

echo "[captures] 1/3 7B int4 cached Bc=48" >&2
BENCH_WQ=int4 BENCH_CACHE_BATCH=48 timeout 4000 python bench.py \
  > /tmp/bench_7b_int4_b48.json 2>/tmp/bench_7b_int4_b48.err \
  && cp /tmp/bench_7b_int4_b48.json BENCH_7B_INT4_b48.json \
  && echo "[captures] 7B int4 Bc=48 ok" >&2 \
  || echo "[captures] 7B int4 Bc=48 FAILED (see err)" >&2

echo "[captures] 2/3 13B int4 streaming B=4 (cached Bc=16 rides along)" >&2
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

echo "[captures] 3/3 13B int4 cached Bc=32 (fallback 24)" >&2
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
echo "[captures] done $(date -u +%H:%M:%S)" >&2
