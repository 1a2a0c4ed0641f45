#!/bin/bash
# Round-5 chip queue, part 6: RE-RUN of the MoE arms from r5c — both
# died instantly on `ModuleNotFoundError: dalm_tpu` (tools/bench_moe.py
# was the one tools/ script missing the repo-root sys.path insert; the
# other harnesses all carry it). Fixed at the import site; these are
# the first on-chip MoE numbers (VERDICT r4 item 1b).
# Serialized with 45 s gaps per the axon-tunnel discipline.
set -x
cd "$(dirname "$0")/.."

timeout 3600 python tools/bench_moe.py --train > experiments/results_r5_moe_train.log 2>&1
sleep 45

timeout 2400 python tools/bench_moe.py --serve > experiments/results_r5_moe_serve.log 2>&1
sleep 45

# spec mismatch attribution: greedy-vs-greedy across program shapes
# (no speculation) — if these flip on chip like the spec arms did,
# the bf16 program-shape-sensitivity attribution holds (CPU/f32 is
# exact on all arms).
timeout 2400 python tools/spec_mismatch_probe.py > experiments/results_r5_spec_mismatch_probe.log 2>&1

echo "QUEUE_R5F DONE"
