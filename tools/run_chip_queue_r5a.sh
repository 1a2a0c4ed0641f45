#!/bin/bash
# Round-5 chip queue, part 1: the GQA int8-KV arms (VERDICT r4 item 2 —
# the round-4 log was empty; this re-runs the full A/B properly).
# Four arms on the GQA (llama3-8B, 8 kv heads) and small-MHA (phi3-mini)
# shapes:
#   1. float KV baseline (fresh paired baseline on today's code)
#   2. int8 KV, equal slots  (pure cache-traffic effect)
#   3. int8 KV, 2x slots     (the capacity argument)
#   4. float KV, 2x slots    (control: does the float cache ALSO fit at
#      2x on GQA? If yes, the capacity win is not kv-quant-specific there)
# Serialized with 45 s gaps per the axon-tunnel discipline.
set -x
cd "$(dirname "$0")/.."

DALM_BENCH_PRESETS=8B,phi3 timeout 2400 python bench_serve.py --7b \
  > experiments/results_r5_kvq_gqa_base.log 2>&1
sleep 45

DALM_BENCH_PRESETS=8B,phi3 DALM_KV_QUANT=1 timeout 2400 python bench_serve.py --7b \
  > experiments/results_r5_kvq_gqa_eq.log 2>&1
sleep 45

DALM_BENCH_PRESETS=8B,phi3 DALM_KV_QUANT=1 DALM_SLOTS_MULT=2 timeout 2400 python bench_serve.py --7b \
  > experiments/results_r5_kvq_gqa_2x.log 2>&1
sleep 45

DALM_BENCH_PRESETS=8B,phi3 DALM_SLOTS_MULT=2 timeout 2400 python bench_serve.py --7b \
  > experiments/results_r5_kvq_gqa_float2x.log 2>&1

echo "QUEUE_R5A DONE"
