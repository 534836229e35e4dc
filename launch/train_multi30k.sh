#!/bin/bash
# Multi-30k Transformer K-FAC launcher (reference train_multi30k.sh:
# bs=128, d_model=512, eigen_dp damping=0.03 vs Adam control).
batch_size="${batch_size:-128}"
n_layers="${n_layers:-6}"
optimizer="${optimizer:-sgd}"        # adam = control arm
kfac_name="${kfac_name:-eigen_dp}"
damping="${damping:-0.03}"
epochs="${epochs:-100}"
extra="${extra:-}"

cd "$(dirname "$0")/.."
exec python examples/train_multi30k.py \
  --batch-size "$batch_size" --n-layers "$n_layers" \
  --optimizer "$optimizer" --kfac-name "$kfac_name" \
  --damping "$damping" --epochs "$epochs" --synthetic $extra
