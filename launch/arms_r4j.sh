#!/bin/bash
# Round-4 queue J — third-seed replicate for the ssa3 default flip
# (control vs ssa3 at seed 13; the flip currently rests on seeds 0/7).
cd "$(dirname "$0")/.." || exit 1
set -x
timeout 3600 python tools/convergence_check.py --steps 2000 \
  --variants pcg_prod_dp pcg_ssa3_dp --seed 13 \
  > bench_logs/r4j_ssa3_2k_s13.out 2> bench_logs/r4j_ssa3_2k_s13.err
echo "QUEUE J DONE"
