#!/bin/bash
# Round-5 queue W: long-horizon convergence (VERDICT item 5) + the
# eigen_dp rerun with staggered refreshes (VERDICT item 7).
# Run strictly AFTER queue A (one chip, one claim).
set -x
cd "$(dirname "$0")/.."

# 50k-step scheduler-engaged arms on a widened task (latent-scale 2 =
# 256-dim manifold, 40 classes (the 100-class latent-scale-4 attempt was at chance for ALL arms incl. sgd — queue V logs), 16k train) — the closest this
# environment gets to the reference's CIFAR-110 165-epoch run
# (batch.sh:10-15): 2000-step "epochs" (25 epochs), lr 0.1x at 12/18/22,
# damping 0.5x at 12/18, update freqs x2 at 18, TInv=TCov=10.
# Arms: sgd control, production-pcg, tracking (warmup-only exact),
# eigen_dp (the reference-default semantics, STAGGERED refreshes).
for arm in sgd pcg_prod_dp tracking_dp; do
  timeout 10800 python tools/convergence_check.py --steps 50000 \
    --variants "$arm" --seed 0 --classes 40 --latent-scale 2 \
    --n-train 16384 --eval-every 2000 --epoch-steps 2000 \
    --tinv 10 --tcov 10 --lr-decay 12 18 22 --damping-decay 12 18 \
    --freq-alpha 2 --freq-decay 18 --track-exact-freq 0 \
    > "bench_logs/r5w_50k_${arm}.out" 2> "bench_logs/r5w_50k_${arm}.err"
done
# eigen_dp LAST (the round-4 eigen_dp@TInv=10 program crashed the axon
# worker twice; staggered refreshes are the mitigation under test — if
# it crashes again nothing else is queued behind it)
timeout 10800 python tools/convergence_check.py --steps 50000 \
  --variants eigen_dp --seed 0 --classes 40 --latent-scale 2 \
  --n-train 16384 --eval-every 2000 --epoch-steps 2000 \
  --tinv 10 --tcov 10 --lr-decay 12 18 22 --damping-decay 12 18 \
  --freq-alpha 2 --freq-decay 18 --inv-stagger \
  > bench_logs/r5w_50k_eigen_stag.out 2> bench_logs/r5w_50k_eigen_stag.err

# the 2k eigen_dp@TInv=10 arm that crashed the worker in round 4,
# retried with staggering (VERDICT item 7's "rerun the crashed arm")
timeout 3600 python tools/convergence_check.py --steps 2000 \
  --variants eigen_dp sgd --tinv 10 --tcov 10 --seed 0 --inv-stagger \
  > bench_logs/r5w_2k_eigen_stag.out 2> bench_logs/r5w_2k_eigen_stag.err

echo "QUEUE W DONE"
