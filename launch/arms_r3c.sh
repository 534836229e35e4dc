#!/bin/bash
# Round-3 (continued) evidence queue — runs SERIALLY on the one real chip.
#
# 1. Bucket-merge dispatch-cost A/B on the headline bench (pack_buckets
#    calibration: does merging more aggressively than the measured-rate
#    default win now that CG is fused+warm?).
# 2. tracking_dp 2k-step convergence arm (warmup-only exact refreshes) —
#    the quality-parity evidence for the eigendecomposition-free tracker.
# 3. Transformer copy-task convergence arms (K-FAC vs Adam vs SGD) with
#    greedy BLEU per epoch — multi-workload convergence evidence
#    (reference batch.sh convergence block analogue for multi30k).
# 4. WikiText RNN-LM Markov-task arms (K-FAC vs SGD control).
# 5. SQuAD-tiny synthetic span arms (K-FAC vs AdamW) with span F1/EM.
cd "$(dirname "$0")/.." || exit 1

# ~1500 steps: the copy task needs O(1k) steps to crack (CPU probe:
# single-batch overfit converges; 192 full-data steps stay at chance)
TFM="python examples/train_multi30k.py --synthetic --src-vocab 128 \
  --trg-vocab 128 --d-model 256 --d-ff 512 --n-layers 2 --n-head 4 \
  --dropout 0.0 --seq-len 32 --batch-size 64 --epochs 50 --iters 1500 \
  --eval-bleu --beam-size 1"

set -x
KFB_MERGE_COST=1e-4 timeout 2400 python bench.py \
  > arm_merge_cost1e4.out 2> arm_merge_cost1e4.err

timeout 3600 python tools/convergence_check.py --steps 2000 \
  --variants tracking_dp --track-exact-freq 0 \
  > arm_tracking2k.out 2> arm_tracking2k.err

timeout 2400 $TFM --optimizer adam --warmup-steps 200 \
  > arm_tfm_adam.out 2>&1
timeout 2400 $TFM --optimizer sgd --kfac-update-freq 0 \
  > arm_tfm_sgd.out 2>&1
timeout 2400 $TFM --optimizer sgd --kfac-name eigen_dp \
  > arm_tfm_eigen.out 2>&1
timeout 2400 $TFM --optimizer sgd --kfac-name pcg_dp \
  > arm_tfm_pcg.out 2>&1

RNN="python examples/train_wikitext.py --synthetic --epochs 5 --iters 500"
timeout 2400 $RNN --kfac-update-freq 0 > arm_rnn_sgd.out 2>&1
timeout 2400 $RNN --kfac-update-freq 1 > arm_rnn_kfac.out 2>&1

SQ="python examples/train_squad.py --synthetic --model-size tiny \
  --seq-len 128 --batch-size 8 --epochs 2 --iters 400"
timeout 2400 $SQ --optimizer adamw > arm_sq_adamw.out 2>&1
timeout 2400 $SQ --optimizer sgd --kfac-name eigen_dp \
  --kfac-update-freq 1 --kfac-cov-update-freq 1 > arm_sq_kfac.out 2>&1
echo DONE
