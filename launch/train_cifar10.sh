#!/bin/bash
# CIFAR-10 K-FAC launcher (TPU-native).
# Env-var-parameterized like the reference's train_cifar10.sh:3-26; instead
# of mpirun/ssh hostfiles, parallelism is a jax.sharding.Mesh over the local
# TPU slice (multi-host pods launch this same script on every host).

model="${model:-resnet110}"
batch_size="${batch_size:-128}"
base_lr="${base_lr:-0.1}"
epochs="${epochs:-100}"
lr_decay="${lr_decay:-35 75 90}"
warmup_epochs="${warmup_epochs:-5}"

kfac="${kfac:-1}"                   # TInv; 0 = SGD control arm
kfac_name="${kfac_name:-eigen_dp}"
fac="${fac:-1}"                     # TCov
damping="${damping:-0.03}"
stat_decay="${stat_decay:-0.95}"
kl_clip="${kl_clip:-0.001}"
exclude_parts="${exclude_parts:-}"

data_path="${data_path:-}"
extra="${extra:-}"

cd "$(dirname "$0")/.."
exec python examples/train_cifar.py \
  --model "$model" \
  --batch-size "$batch_size" \
  --base-lr "$base_lr" \
  --epochs "$epochs" \
  --lr-decay $lr_decay \
  --warmup-epochs "$warmup_epochs" \
  --kfac-name "$kfac_name" \
  --kfac-update-freq "$kfac" \
  --kfac-cov-update-freq "$fac" \
  --damping "$damping" \
  --stat-decay "$stat_decay" \
  --kl-clip "$kl_clip" \
  --exclude-parts "$exclude_parts" \
  ${data_path:+--data-path "$data_path"} \
  ${data_path:---synthetic} \
  $extra
