#!/bin/bash
# Round-5 chip queue, part 9: MoE dense-vs-dispatch crossover hunt at
# decode-ish widths (T=16..256). The readback-synced table put dispatch
# ahead at EVERY train shape incl. T=512, refuting the asserted
# "dense if T<=512" auto threshold — the dense regime, if it exists,
# is below. moe_impl="auto" gets recalibrated from this table.
set -x
cd "$(dirname "$0")/.."

DALM_MOE_SMALL=1 timeout 3600 python tools/bench_moe.py --train \
  > experiments/results_r5_moe_train_small.log 2>&1

echo "QUEUE_R5I DONE"
