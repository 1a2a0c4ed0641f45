#!/bin/bash
# Round-5 chip queue, part 15: long-context (P=1024) arms, feasibility-
# sized. The fused engine's admission branch prefills at FULL pool
# width, so prefill intermediates scale with slots*P — 96/192-slot MLA
# arms OOM'd at compile (as did llama2-7B at 8 and 16 slots). Smallest
# viable pools:
set -x
cd "$(dirname "$0")/.."

DALM_PROMPT_LEN=1024 DALM_BENCH_ONLY_7B=1 DALM_SLOTS=4 timeout 2400 \
  python bench_serve.py --7b > experiments/results_r5_p1024_llama_4.log 2>&1
sleep 45

DALM_PROMPT_LEN=1024 DALM_BENCH_PRESETS=mid-7B DALM_SLOTS=16 timeout 2400 \
  python bench_serve.py --7b > experiments/results_r5_p1024_mla_16.log 2>&1
sleep 45

DALM_PROMPT_LEN=1024 DALM_BENCH_PRESETS=mid-7B DALM_SLOTS=32 timeout 2400 \
  python bench_serve.py --7b > experiments/results_r5_p1024_mla_32.log 2>&1

echo "QUEUE_R5O DONE"
