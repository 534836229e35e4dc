#!/bin/bash
# Round-5 chip queue A: perf arms at the corrected (ss3/G1) defaults,
# then the pre-registered convergence re-adjudication seeds (queue S),
# then the 10k scheduler-engaged subsampling arm (queue T).
# Strictly serial — one chip, one claim (verify skill notes).
set -x
cd "$(dirname "$0")/.."

# perf arms: state-traffic levers re-measured now that ss3/G1 shrank the
# factor-GEMM share (round-4 verdicts at ss2/G2 defaults: sdt neutral,
# fused_concat neutral — re-adjudicate at current defaults)
KFB_NO_FALLBACK=1 KFB_SDTYPE=bfloat16 timeout 2400 python bench.py \
  > bench_logs/r5a_bench_sdt.out 2> bench_logs/r5a_bench_sdt.err
KFB_NO_FALLBACK=1 KFB_EMA=fused_concat timeout 2400 python bench.py \
  > bench_logs/r5a_bench_emafused.out 2> bench_logs/r5a_bench_emafused.err
KFB_NO_FALLBACK=1 KFB_SDTYPE=bfloat16 KFB_EMA=fused_concat \
  timeout 2400 python bench.py \
  > bench_logs/r5a_bench_both.out 2> bench_logs/r5a_bench_both.err

# queue S: pre-registered seeds (BENCH_NOTES Round 5 decision rule)
for seed in 1 2 3 4; do
  timeout 3600 python tools/convergence_check.py --steps 2000 \
    --variants pcg_prod_dp pcg_ssa3_dp pcg_ssa2_dp --seed "$seed" \
    > "bench_logs/r5s_2k_s${seed}.out" 2> "bench_logs/r5s_2k_s${seed}.err"
done

# queue T: 10k scheduler-engaged subsampling arm (round-4 recipe:
# 1000-step epochs, lr decay 5/8, damping decay 5/7, freq x2 at 7,
# TInv=TCov=10), ssa3+ssa2 vs control at seed 0
timeout 7200 python tools/convergence_check.py --steps 10000 \
  --variants pcg_prod_dp pcg_ssa3_dp pcg_ssa2_dp --seed 0 \
  --eval-every 1000 --epoch-steps 1000 --tinv 10 --tcov 10 \
  --lr-decay 5 8 --damping-decay 5 7 --freq-alpha 2 --freq-decay 7 \
  > bench_logs/r5t_10k.out 2> bench_logs/r5t_10k.err

echo "QUEUE A DONE"
