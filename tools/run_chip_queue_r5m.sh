#!/bin/bash
# Round-5 chip queue, part 13: the 7B-CLASS MLA serve tier — llama2-7B
# geometry with V3 latent attention (~5.9B params, int8 ≈ 5.9 GB).
# The direct MLA-vs-MHA comparison at the same model class: llama2-7B
# caps at 32 slots (1612 tok/s); the latent cache makes slots nearly
# free. Two slot arms to find the weight-stream plateau.
set -x
cd "$(dirname "$0")/.."

DALM_BENCH_PRESETS=mid-7B timeout 2400 python bench_serve.py --7b \
  > experiments/results_r5_mla7b_serve_192.log 2>&1
sleep 45

DALM_BENCH_PRESETS=mid-7B DALM_SLOTS=96 timeout 2400 python bench_serve.py --7b \
  > experiments/results_r5_mla7b_serve_96.log 2>&1

echo "QUEUE_R5M DONE"
