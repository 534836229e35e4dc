#!/bin/bash
# Round-4 queue H — runs SERIALLY on the one real chip.
#
# A-only position subsampling (strided A Grams, EXACT G Grams —
# factor_g_spatial_stride=1). ss3 full (A+G) striding failed its 2k
# validation (seed0 val_acc 0.5298 vs control 0.6025); these arms decide
# whether the quality loss is G-driven. Controls already measured:
#   seed0: sgd 0.497 / prod 0.6025 / ss2 0.5947 / ss3 0.5298
#   seed7: sgd 0.472 / prod 0.564  / ss2 0.528
# Then bench step-time probes for the ssa configs.
cd "$(dirname "$0")/.." || exit 1
set -x
timeout 3600 python tools/convergence_check.py --steps 2000 \
  --variants pcg_ssa2_dp pcg_ssa3_dp --seed 0 \
  > bench_logs/r4h_ssa_2k_s0.out 2> bench_logs/r4h_ssa_2k_s0.err
timeout 3600 python tools/convergence_check.py --steps 2000 \
  --variants pcg_ssa2_dp pcg_ssa3_dp --seed 7 \
  > bench_logs/r4h_ssa_2k_s7.out 2> bench_logs/r4h_ssa_2k_s7.err
KFB_G_SPATIAL_STRIDE=1 timeout 2400 python bench.py \
  > bench_logs/r4h_bench_ssa2.out 2> bench_logs/r4h_bench_ssa2.err
KFB_SPATIAL_STRIDE=3 KFB_G_SPATIAL_STRIDE=1 timeout 2400 python bench.py \
  > bench_logs/r4h_bench_ssa3.out 2> bench_logs/r4h_bench_ssa3.err
echo "QUEUE H DONE"
