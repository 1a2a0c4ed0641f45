#!/bin/bash
# Round-4 chip queue, part 3:
#   1. sampled-speculative serve A/B (rerun — part-2 run died on sys.path)
#   2. trace the fused-W8A8 flagship step (the recorded-negative evidence:
#      where did the -8% go?)
#   3. trace the default (XLA-rowquant) flagship step for the same window
# Serialized with 45 s gaps per the axon-tunnel discipline.
set -x
cd "$(dirname "$0")/.."

timeout 2400 python tools/bench_spec_sampled.py \
  > experiments/results_r4_spec_sampled_ab.log 2>&1
sleep 45

DALM_W8A8_KERNEL=fused timeout 2400 python tools/trace_flagship.py \
  --out /tmp/trace_flag_fused \
  > experiments/results_r4_trace_fused.log 2>&1
sleep 45

timeout 2400 python tools/trace_flagship.py --out /tmp/trace_flag_default \
  > experiments/results_r4_trace_default.log 2>&1

echo "QUEUE_R4C DONE"
