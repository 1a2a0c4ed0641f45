#!/bin/bash
# Round-4 chip queue, part 1 — the two VERDICT perf items, decided by
# full-program A/B (the round-3 methodology; microbenches on this box
# are artifact-bound, RESULTS.md "microbenchmark methodology"):
#   1. flagship train bench: baseline vs DALM_W8A8_KERNEL=fused
#      (activation quantization fused into the Pallas matmul — attacks
#      the 21.5% dynamic-quant bookkeeping share)
#   2. int4 7B serve: base vs i8mxu (nibbles->int8, int8 MXU dots) vs
#      nf4 (NormalFloat4 codebook quality tier)
# Serialized with 45 s gaps per the axon-tunnel discipline.
set -x
cd "$(dirname "$0")/.."

timeout 2400 python bench.py \
  > experiments/results_r4_bench_flagship_base.log 2>&1
sleep 45

DALM_W8A8_KERNEL=fused timeout 2400 python bench.py \
  > experiments/results_r4_bench_flagship_fused.log 2>&1
sleep 45

for v in base i8mxu; do
  DALM_BENCH_ONLY_7B=1 DALM_INT4_VARIANT=$v \
    timeout 2400 python bench_serve.py --7b --int4 \
    > "experiments/results_r4_int4_serve_ab_${v}.log" 2>&1
  sleep 45
done

DALM_BENCH_ONLY_7B=1 DALM_QUANT_TIER=nf4 \
  timeout 2400 python bench_serve.py --7b --int4 \
  > experiments/results_r4_int4_serve_ab_nf4.log 2>&1

echo "QUEUE_R4A DONE"
