#!/bin/bash
# int4 dequant-variant A/B through the REAL serve bench (7B row only).
# Per-op microbenches on this box cannot resolve in-kernel differences
# (RESULTS.md "microbenchmark methodology"); tokens/sec through
# bench_serve is the discriminator. Serialized with 45 s gaps per the
# axon-tunnel discipline; launch detached (setsid).
set -x
cd "$(dirname "$0")/.."

for v in base floorsplit groupmm decomp; do
  DALM_BENCH_ONLY_7B=1 DALM_INT4_VARIANT=$v \
    timeout 2400 python bench_serve.py --7b --int4 \
    > "experiments/results_r3_int4_serve_ab_${v}.log" 2>&1
  sleep 45
done
echo "INT4_SERVE_AB_DONE"
