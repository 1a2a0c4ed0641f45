#!/bin/bash
# Round-5 chip queue, part 10: insurance re-run of the driver bench at
# HEAD after the round's library changes (MoE auto recalibration, int4
# Mosaic gate, NF4 host-constant) — none touch the flagship path, but
# the driver's end-of-round bench.py must hold 23.9; verify now.
set -x
cd "$(dirname "$0")/.."

timeout 2400 python bench.py > experiments/results_r5_bench_flagship_head.log 2>&1

echo "QUEUE_R5J DONE"
