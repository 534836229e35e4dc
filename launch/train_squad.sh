#!/bin/bash
# SQuAD BERT K-FAC finetuning launcher (reference train_squad.sh: bs=4,
# lr 5e-6 x workers, 3 epochs, eigen_dp damping=0.03, vocab 30522 excluded).
model_size="${model_size:-base}"
batch_size="${batch_size:-4}"
optimizer="${optimizer:-sgd}"        # adamw = control arm
kfac_name="${kfac_name:-eigen_dp}"
damping="${damping:-0.03}"
epochs="${epochs:-3}"
extra="${extra:-}"

cd "$(dirname "$0")/.."
exec python examples/train_squad.py \
  --model-size "$model_size" --batch-size "$batch_size" \
  --optimizer "$optimizer" --kfac-name "$kfac_name" \
  --damping "$damping" --epochs "$epochs" --synthetic $extra
