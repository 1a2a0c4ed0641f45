#!/bin/bash
# Round-3 chip queue, part 3: post-fix confirmation of the fused-schedule
# regression fix (one-hot single-token KV writes) across the serving
# benches. Serialized with 45 s gaps; launch detached.
set -x
cd "$(dirname "$0")/.."

timeout 1800 python /tmp/bench_fused_focus.py \
  > experiments/results_r3_fused_ab_head_fixed.log 2>&1
sleep 45

timeout 4000 python bench_serve.py \
  > experiments/results_r3_bench_serve3.log 2>&1
sleep 45

timeout 4000 python bench_serve.py --7b \
  > experiments/results_r3_bench_serve_7b_fixed.log 2>&1

echo "QUEUE3 DONE"
