#!/bin/bash
# Round-5 queue Y: second seed (1) for the 50k eigen/tracking arms —
# the queue-W "tracking holds the eigen band" ordering rests on seed 0.
set -x
cd "$(dirname "$0")/.."
for arm in eigen tracking; do
  if [ "$arm" = eigen ]; then
    variant="eigen_dp"; extra="--inv-stagger"; tef=50
  else
    variant="tracking_dp"; extra=""; tef=0
  fi
  timeout 10800 python tools/convergence_check.py --steps 50000 \
    --variants "$variant" --seed 1 --classes 40 --latent-scale 2 \
    --n-train 16384 --eval-every 2000 --epoch-steps 2000 \
    --tinv 10 --tcov 10 --lr-decay 12 18 22 --damping-decay 12 18 \
    --freq-alpha 2 --freq-decay 18 --track-exact-freq "$tef" $extra \
    > "bench_logs/r5y_50k_${arm}_s1.out" \
    2> "bench_logs/r5y_50k_${arm}_s1.err"
done
echo "QUEUE Y DONE"
