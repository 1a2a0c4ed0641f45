#!/bin/bash
# Round-5 chip queue, part 7: re-run the int4-tier quality A/B — the
# first run crashed on chip in the int4 tier (Mosaic block-mapping: the
# tiny generator's 64-wide matmuls are not 128-lane tileable). The
# kernels now gate Mosaic legality into the feasibility check and take
# the XLA dequant fallback for sub-tile shapes (regression-tested).
set -x
cd "$(dirname "$0")/.."

timeout 2400 python tools/quality_int4_tiers.py \
  > experiments/results_r5_int4_quality_tiers.log 2>&1

echo "QUEUE_R5G DONE"
