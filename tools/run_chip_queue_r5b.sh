#!/bin/bash
# Round-5 chip queue, part 2: complete the GQA/small-MHA int8-KV story.
# r5a found: 8B-GQA kvq +14% at equal slots (3805.6 -> 4335.9); 8B at
# 192 slots OOMs at COMPILE on program temps (not cache bytes); phi3
# float/64 OOMs where kvq/64 fits (2731.9). These arms pin the real
# ceilings:
#   1. phi3 float 64 in a FRESH process (was it the 8B row's leftovers?)
#   2. phi3 float 32 (the float baseline that surely fits)
#   3. phi3 kvq 128 (2x of the preset count)
#   4. 8B float 128 / kvq 128 (is there slot headroom past 96 at all?)
set -x
cd "$(dirname "$0")/.."

DALM_BENCH_PRESETS=phi3 timeout 2400 python bench_serve.py --7b \
  > experiments/results_r5_kvq_phi3_float64.log 2>&1
sleep 45

DALM_BENCH_PRESETS=phi3 DALM_SLOTS=32 timeout 2400 python bench_serve.py --7b \
  > experiments/results_r5_kvq_phi3_float32.log 2>&1
sleep 45

DALM_BENCH_PRESETS=phi3 DALM_KV_QUANT=1 DALM_SLOTS=128 timeout 2400 python bench_serve.py --7b \
  > experiments/results_r5_kvq_phi3_kvq128.log 2>&1
sleep 45

DALM_BENCH_PRESETS=8B DALM_SLOTS=128 timeout 2400 python bench_serve.py --7b \
  > experiments/results_r5_kvq_8b_float128.log 2>&1
sleep 45

DALM_BENCH_PRESETS=8B DALM_KV_QUANT=1 DALM_SLOTS=128 timeout 2400 python bench_serve.py --7b \
  > experiments/results_r5_kvq_8b_kvq128.log 2>&1

echo "QUEUE_R5B DONE"
