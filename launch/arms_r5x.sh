#!/bin/bash
# Round-5 queue X: close the loop on queue W's findings.
# 1. tracking WITH periodic exact refreshes at 50k — tests the README
#    recommendation that tracking_exact_freq>0 recovers the warmup-only
#    arm's long-horizon gap (still amortized: one exact refresh per 50
#    steps on top of TInv=10 tracking refreshes).
# 2. second seed of the 10k scheduler-engaged subsampling arm (the
#    pre-registered rule's 10k leg ran one seed).
# 3. second seed of the 50k sgd/pcg pair (queue W ran seed 0 only).
set -x
cd "$(dirname "$0")/.."

timeout 10800 python tools/convergence_check.py --steps 50000 \
  --variants tracking_dp --seed 0 --classes 40 --latent-scale 2 \
  --n-train 16384 --eval-every 2000 --epoch-steps 2000 \
  --tinv 10 --tcov 10 --lr-decay 12 18 22 --damping-decay 12 18 \
  --freq-alpha 2 --freq-decay 18 --track-exact-freq 50 \
  > bench_logs/r5x_50k_tracking_exact50.out \
  2> bench_logs/r5x_50k_tracking_exact50.err

timeout 7200 python tools/convergence_check.py --steps 10000 \
  --variants pcg_prod_dp pcg_ssa3_dp --seed 7 \
  --eval-every 1000 --epoch-steps 1000 --tinv 10 --tcov 10 \
  --lr-decay 5 8 --damping-decay 5 7 --freq-alpha 2 --freq-decay 7 \
  > bench_logs/r5x_10k_s7.out 2> bench_logs/r5x_10k_s7.err

for arm in sgd pcg_prod_dp; do
  timeout 10800 python tools/convergence_check.py --steps 50000 \
    --variants "$arm" --seed 1 --classes 40 --latent-scale 2 \
    --n-train 16384 --eval-every 2000 --epoch-steps 2000 \
    --tinv 10 --tcov 10 --lr-decay 12 18 22 --damping-decay 12 18 \
    --freq-alpha 2 --freq-decay 18 \
    > "bench_logs/r5x_50k_${arm}_s1.out" \
    2> "bench_logs/r5x_50k_${arm}_s1.err"
done

echo "QUEUE X DONE"
