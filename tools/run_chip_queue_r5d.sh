#!/bin/bash
# Round-5 chip queue, part 4: tier COMPOSITION — int4 weights × int8 KV
# on the 13B capacity tier. 13B int4 weighs 6.5 GB on a 16 GB chip;
# r4 recorded 513 tok/s at 16 slots. The freed cache bytes should buy
# 2x slots exactly as on 7B MHA (13B is MHA, 40 heads).
#   1. 13B int4 float-KV 16 slots (fresh paired baseline)
#   2. 13B int4 int8-KV 16 slots (cache-traffic effect)
#   3. 13B int4 int8-KV 32 slots (capacity arm)
# Serialized with 45 s gaps per the axon-tunnel discipline.
set -x
cd "$(dirname "$0")/.."

DALM_BENCH_PRESETS=13B timeout 2400 python bench_serve.py --7b --int4 \
  > experiments/results_r5_13b_int4_base.log 2>&1
sleep 45

DALM_BENCH_PRESETS=13B DALM_KV_QUANT=1 timeout 2400 python bench_serve.py --7b --int4 \
  > experiments/results_r5_13b_int4_kvq.log 2>&1
sleep 45

DALM_BENCH_PRESETS=13B DALM_KV_QUANT=1 DALM_SLOTS=32 timeout 2400 python bench_serve.py --7b --int4 \
  > experiments/results_r5_13b_int4_kvq2x.log 2>&1

echo "QUEUE_R5D DONE"
