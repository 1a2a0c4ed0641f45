#!/bin/bash
# Round-3 chip-gated measurement queue (VERDICT r2 item 2), serialized
# with gaps per the axon-relay discipline: one TPU process at a time,
# never killed, 45 s between jobs.
set -x
cd "$(dirname "$0")/.."

timeout 3000 python bench_index.py --embed --10m \
  > experiments/results_r3_bench_index.log 2>&1
sleep 45

timeout 3000 python tools/bench_int4_variants.py \
  > experiments/results_r3_int4_variants.log 2>&1
sleep 45

timeout 4000 python bench_serve.py \
  > experiments/results_r3_bench_serve.log 2>&1
sleep 45

timeout 4000 python bench_serve.py --7b \
  > experiments/results_r3_bench_serve_7b.log 2>&1
sleep 45

timeout 10000 python experiments/llama_index_twin.py --with-dalm-arms --seeds 3 \
  > experiments/results_r3_llama_twin.log 2>&1
sleep 45

timeout 4000 python bench.py > experiments/results_r3_bench_flagship.log 2>&1
echo "QUEUE DONE"
