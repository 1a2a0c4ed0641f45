#!/bin/bash
# Round-5 chip queue, part 14: LONG-CONTEXT serve — the regime the MLA
# cache ratio compounds in. At P=1024 (L=1152) an MHA 7B slot costs
# ~0.6 GB of cache; the MLA-7B slot ~1.3 MB. Arms:
#   1. llama2-7B at P1024, 8 slots (its plausible ceiling)
#   2. llama2-7B at P1024, 16 slots (probe the real ceiling; may OOM)
#   3. MLA-7B at P1024, 96 slots
#   4. MLA-7B at P1024, 192 slots
set -x
cd "$(dirname "$0")/.."

DALM_PROMPT_LEN=1024 DALM_BENCH_ONLY_7B=1 DALM_SLOTS=8 timeout 2400 \
  python bench_serve.py --7b > experiments/results_r5_p1024_llama_8.log 2>&1
sleep 45

DALM_PROMPT_LEN=1024 DALM_BENCH_ONLY_7B=1 DALM_SLOTS=16 timeout 2400 \
  python bench_serve.py --7b > experiments/results_r5_p1024_llama_16.log 2>&1
sleep 45

DALM_PROMPT_LEN=1024 DALM_BENCH_PRESETS=mid-7B DALM_SLOTS=96 timeout 2400 \
  python bench_serve.py --7b > experiments/results_r5_p1024_mla_96.log 2>&1
sleep 45

DALM_PROMPT_LEN=1024 DALM_BENCH_PRESETS=mid-7B DALM_SLOTS=192 timeout 2400 \
  python bench_serve.py --7b > experiments/results_r5_p1024_mla_192.log 2>&1

echo "QUEUE_R5N DONE"
