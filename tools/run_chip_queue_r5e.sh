#!/bin/bash
# Round-5 chip queue, part 5: re-run the dycal flagship A/B after the
# per-step-probe fix (the 16-step-stale refresh failed the loss witness:
# 14.06 vs 9.46 — dy decays too fast for a stale per-tensor scale; the
# probe now runs every step so dy_scale is exactly one step stale, and
# the CPU witness tracks to 5 decimals). Baseline already recorded this
# round (results_r5_bench_flagship_cal.log: 23.904 @ 9.4574).
#   Also: the int4-tier quality A/B on the chip-trained full-quote
#   generator (needs r5c's --prepare artifacts).
set -x
cd "$(dirname "$0")/.."

DALM_A8_DY=1 timeout 2400 python bench.py \
  > experiments/results_r5_bench_flagship_dycal2.log 2>&1
sleep 45

timeout 2400 python tools/quality_int4_tiers.py \
  > experiments/results_r5_int4_quality_tiers.log 2>&1

echo "QUEUE_R5E DONE"
