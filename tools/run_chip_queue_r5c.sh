#!/bin/bash
# Round-5 chip queue, part 3:
#   1/2. flagship bench A/B: shipped default (a8cal16) vs +dy-calibrated
#        backward scales (DALM_A8_DY=1) — paired, with final_loss witness
#   3/4. int4 serve A/B: per-group base vs the per-column-scale layout
#        (full-depth int8 MXU dots) — the door i8mxu left open
#   5/6. first MoE numbers: dense-vs-dispatch train crossover (390M
#        16-expert shape) + mixtral-mini-4B int8 serve tier
#   7/8. speculation-win: train the full-quote generator (rag-e2e, tiny)
#        then the lockstep-acceptance + fused gamma A/B on its held-out
#        workload
# Serialized with 45 s gaps per the axon-tunnel discipline.
set -x
cd "$(dirname "$0")/.."

timeout 2400 python bench.py > experiments/results_r5_bench_flagship_cal.log 2>&1
sleep 45

DALM_A8_DY=1 timeout 2400 python bench.py > experiments/results_r5_bench_flagship_dycal.log 2>&1
sleep 45

DALM_BENCH_ONLY_7B=1 timeout 2400 python bench_serve.py --7b --int4 \
  > experiments/results_r5_int4_base.log 2>&1
sleep 45

DALM_BENCH_ONLY_7B=1 DALM_QUANT_TIER=int4pc timeout 2400 python bench_serve.py --7b --int4 \
  > experiments/results_r5_int4_pcol.log 2>&1
sleep 45

timeout 3600 python tools/bench_moe.py --train > experiments/results_r5_moe_train.log 2>&1
sleep 45

timeout 2400 python tools/bench_moe.py --serve > experiments/results_r5_moe_serve.log 2>&1
sleep 45

timeout 3600 python tools/bench_spec_win.py --prepare > experiments/results_r5_spec_prepare.log 2>&1
sleep 45

timeout 2400 python tools/bench_spec_win.py > experiments/results_r5_spec_win.log 2>&1

echo "QUEUE_R5C DONE"
