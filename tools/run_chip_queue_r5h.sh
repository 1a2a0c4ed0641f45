#!/bin/bash
# Round-5 chip queue, part 8:
#   1. bench_moe --train RE-RUN — the first recording timed with
#      block_until_ready, which this transport acks early (the dense
#      T=512 "1.75 ms" was dispatch, not device time); now synced by
#      scalar loss readback like bench.py.
#   2. spec_mismatch_probe extended with the f32-on-chip arm (both
#      bf16 controls were 0/32, so the discriminator is whether spec
#      mismatches vanish at f32/HIGHEST on the same chip).
set -x
cd "$(dirname "$0")/.."

timeout 3600 python tools/bench_moe.py --train > experiments/results_r5_moe_train.log 2>&1
sleep 45

timeout 2400 python tools/spec_mismatch_probe.py > experiments/results_r5_spec_mismatch_probe.log 2>&1

echo "QUEUE_R5H DONE"
