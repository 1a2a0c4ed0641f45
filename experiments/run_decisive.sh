#!/bin/bash
# Round-2 decisive quality experiments (VERDICT r1 items 2+3).
# Serializes TPU processes with gaps (axon relay: back-to-back JAX
# process starts can wedge the chip claim — see project memory).
set -x
COMMON="--task chars --pair-vocab 30 --passages 2048 --epochs 16 --lr 1e-3 \
  --batch 32 --marginalize-k 8 --marginalize-scale 10 \
  --marginalize-warmup-frac 0.25 --answer-repeats 3 --gen-len 160"

# 1. Label-noise regime: contrastive labels 30% corrupted; generator
#    feedback (marg-only) must recover what contrastive-only cannot.
timeout 14000 python experiments/quality_directional.py $COMMON \
  --arms ro,e2e,margonly --marginalize-mode token --label-noise 0.3 \
  --seeds 8 --out experiments/results_decisive_noise
sleep 45

# 2. Clean-label regime: same arms, no noise — generator feedback alone
#    vs contrastive alone at equal budget.
timeout 14000 python experiments/quality_directional.py $COMMON \
  --arms ro,margonly --marginalize-mode token \
  --seeds 8 --out experiments/results_decisive_clean
sleep 45

# 3. Mode ablation: RAG-sequence margonly under noise (documents why
#    token is the default — the |answer|x weaker retrieval gradient).
timeout 7000 python experiments/quality_directional.py $COMMON \
  --arms margonly --marginalize-mode sequence --label-noise 0.3 \
  --seeds 2 --out experiments/results_margmode_seq
