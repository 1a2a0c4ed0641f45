#!/bin/bash
# Round-3 chip queue, part 2: jobs lost when the part-1 shell died mid
# bench.py (session interruption). Serialized with 45 s gaps per the
# axon-tunnel discipline; launched detached (setsid) so a session death
# cannot kill a TPU-holding process.
set -x
cd "$(dirname "$0")/.."

# Focused A/B for the fused continuous-batching regression (121.8 vs
# the recorded 271 answers/s): same script, HEAD tree vs the worktree
# checked out at the recording commit (1a0abd6).
timeout 1800 python /tmp/bench_fused_focus.py \
  > experiments/results_r3_fused_ab_head.log 2>&1
sleep 45

(cd /tmp/engine_271 && timeout 1800 python /tmp/bench_fused_focus.py) \
  > experiments/results_r3_fused_ab_271.log 2>&1
sleep 45

# Full serve bench with the relaxed bf16-tie assert: records the
# speculative streaming TTFT/throughput deltas (VERDICT r2 weak #7).
timeout 4000 python bench_serve.py \
  > experiments/results_r3_bench_serve2.log 2>&1
sleep 45

# int4 capacity tier incl. llama2-13B via the committed --int4 flag.
timeout 4000 python bench_serve.py --7b --int4 \
  > experiments/results_r3_bench_serve_7b_int4.log 2>&1
sleep 45

# Flagship training bench (the part-1 run was killed mid-tokenize).
timeout 4000 python bench.py \
  > experiments/results_r3_bench_flagship.log 2>&1

echo "QUEUE2 DONE"
