#!/bin/bash
# Round-5 chip queue, part 11: the MLA serve tier (deepseek-v3-mini,
# ~4B dense MLA: latent cache 1152 B/token vs llama2-7B's 32 KB) —
# first on-chip number for the new family. Three slot counts to find
# the ceiling the latent cache buys (256 preset, then 128/384 arms).
set -x
cd "$(dirname "$0")/.."

DALM_BENCH_PRESETS=mla timeout 2400 python bench_serve.py --7b \
  > experiments/results_r5_mla_serve_256.log 2>&1
sleep 45

DALM_BENCH_PRESETS=mla DALM_SLOTS=128 timeout 2400 python bench_serve.py --7b \
  > experiments/results_r5_mla_serve_128.log 2>&1
sleep 45

DALM_BENCH_PRESETS=mla DALM_SLOTS=384 timeout 2400 python bench_serve.py --7b \
  > experiments/results_r5_mla_serve_384.log 2>&1

echo "QUEUE_R5K DONE"
