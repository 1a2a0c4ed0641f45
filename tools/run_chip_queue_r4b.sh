#!/bin/bash
# Round-4 chip queue, part 2:
#   1. fused-W8A8 flagship bench RERUN (after the Mosaic lane-offset fix)
#   2. sampled-speculative serve A/B (rejection verification cost at 7B shape)
#   3. in-domain twin: downstream corpus = pretraining vocabulary, fresh
#      passages — tests the refined linear-residual theory
#   4. decisive noise protocol FROM the pretrained proxy base on the
#      multi-token mixed testbed (VERDICT r3 #1b)
# Serialized with 45 s gaps per the axon-tunnel discipline.
set -x
cd "$(dirname "$0")/.."

DALM_W8A8_KERNEL=fused timeout 2400 python bench.py \
  > experiments/results_r4_bench_flagship_fused2.log 2>&1
sleep 45

timeout 2400 python tools/bench_spec_sampled.py \
  > experiments/results_r4_spec_sampled_ab.log 2>&1
sleep 45

timeout 5400 python experiments/llama_index_twin.py \
  --base-dir experiments/proxy_base/encoder \
  --vocab-json experiments/proxy_base/meta.json --in-domain \
  --generator experiments/proxy_base/generator \
  --with-dalm-arms --seeds 3 --out experiments/results_twin_indomain \
  > experiments/results_r4_twin_indomain.log 2>&1
sleep 45

timeout 9000 python experiments/quality_directional.py \
  --task mixed --vocab-json experiments/proxy_base/meta.json \
  --base-dir experiments/proxy_base/encoder \
  --generator experiments/proxy_base/generator \
  --passages 2048 --epochs 16 --lr 1e-3 --batch 32 \
  --marginalize-k 8 --marginalize-scale 10 --marginalize-warmup-frac 0.25 \
  --gen-len 224 --arms ro,margonly --marginalize-mode token \
  --label-noise 0.3 --seeds 3 \
  --out experiments/results_decisive_noise_pretrained \
  > experiments/results_r4_noise_pretrained.log 2>&1

echo "QUEUE_R4B DONE"
