#!/bin/bash
# Round-5 chip queue, part 12: final insurance bench at HEAD after the
# MLA/V3/yarn additions (none touch the flagship path; the driver runs
# bench.py at round end and this confirms it holds).
set -x
cd "$(dirname "$0")/.."

timeout 2400 python bench.py > experiments/results_r5_bench_flagship_final.log 2>&1

echo "QUEUE_R5L DONE"
