#!/bin/bash
# ImageNet ResNet-50 K-FAC launcher (TPU-native).
# Mirrors the reference's train_imagenet.sh:3-24 canonical config:
# bs=32/device, base-lr 0.0125 x devices, 55 epochs (25/35/40/45/50 decay),
# warmup 5, eigen_dp damping 0.002, damping/update-freq decay at 25/35.

model="${model:-imagenet-resnet50}"
batch_size="${batch_size:-32}"       # per device
base_lr="${base_lr:-0.0125}"
epochs="${epochs:-55}"
n_devices="${n_devices:-}"           # empty = single device

kfac="${kfac:-1}"
kfac_name="${kfac_name:-eigen_dp}"
fac="${fac:-1}"
damping="${damping:-0.002}"
stat_decay="${stat_decay:-0.95}"
kl_clip="${kl_clip:-0.001}"
exclude_parts="${exclude_parts:-}"
checkpoint_dir="${checkpoint_dir:-}"

data_path="${data_path:-}"
extra="${extra:-}"

cd "$(dirname "$0")/.."
exec python examples/train_imagenet.py \
  --model "$model" \
  --batch-size "$batch_size" \
  --base-lr "$base_lr" \
  --epochs "$epochs" \
  --label-smoothing 0.1 \
  --kfac-name "$kfac_name" \
  --kfac-update-freq "$kfac" \
  --kfac-cov-update-freq "$fac" \
  --damping "$damping" \
  --stat-decay "$stat_decay" \
  --kl-clip "$kl_clip" \
  --exclude-parts "$exclude_parts" \
  ${n_devices:+--n-devices "$n_devices"} \
  ${checkpoint_dir:+--checkpoint-dir "$checkpoint_dir"} \
  ${data_path:+--data-path "$data_path"} \
  ${data_path:---synthetic} \
  $extra
