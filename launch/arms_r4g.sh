#!/bin/bash
# Round-4 queue G — runs SERIALLY on the one real chip.
#
# ss3 (factor_spatial_stride=3, 1/9 of conv positions) 2k convergence
# arms at BOTH seeds used by the ss2 flip decision (controls already
# measured: seed0 sgd 0.497 / prod 0.6025 / ss2 0.5947; seed7 sgd 0.472 /
# prod 0.564 / ss2 0.528). Decides whether the measured 1.63x ss3 bench
# arm can become a default or stays an option.
cd "$(dirname "$0")/.." || exit 1
set -x
timeout 3600 python tools/convergence_check.py --steps 2000 \
  --variants pcg_ss3_dp --seed 0 \
  > bench_logs/r4g_ss3_2k_s0.out 2> bench_logs/r4g_ss3_2k_s0.err
timeout 3600 python tools/convergence_check.py --steps 2000 \
  --variants pcg_ss3_dp --seed 7 \
  > bench_logs/r4g_ss3_2k_s7.out 2> bench_logs/r4g_ss3_2k_s7.err
echo "QUEUE G DONE"
