#!/bin/bash
# REAL-DATA CIFAR-10 reference-scale convergence run, one command.
#
# The day real data exists, mount/copy the standard torchvision
# "cifar-10-batches-py" directory (data_batch_1..5 + test_batch pickles —
# exactly what /root/reference/examples/pytorch_cifar10_resnet.py:158-192
# consumes) anywhere on disk and run:
#
#   bash launch/train_cifar10_real.sh /path/to/cifar-10-batches-py
#
# This converts the pickles to npz (tools/make_dataset_npz.py, round-trip
# tested against a synthesized bit-replica of the pickle format in
# tests/test_tools.py) and launches the reference's canonical 165-epoch
# ResNet-110 schedule (train_cifar10.sh:5-14 + batch.sh:10-15: bs=128,
# lr 0.1 warmup 1, decay 0.1x at epochs 82/123, eigen_dp damping 0.03
# TInv=TCov=1, stat_decay 0.95). Target: 93-94% top-1 val accuracy.
set -euo pipefail

raw_dir="${1:?usage: train_cifar10_real.sh /path/to/cifar-10-batches-py}"
out_npz="${out_npz:-/tmp/cifar10.npz}"

cd "$(dirname "$0")/.."
python tools/make_dataset_npz.py cifar10 "$raw_dir" -o "$out_npz"

model="${model:-resnet110}" \
batch_size="${batch_size:-128}" \
base_lr="${base_lr:-0.1}" \
epochs="${epochs:-165}" \
lr_decay="${lr_decay:-82 123}" \
warmup_epochs="${warmup_epochs:-1}" \
kfac="${kfac:-1}" \
fac="${fac:-1}" \
kfac_name="${kfac_name:-eigen_dp}" \
damping="${damping:-0.03}" \
stat_decay="${stat_decay:-0.95}" \
data_path="$out_npz" \
extra="${extra:-}" \
exec bash launch/train_cifar10.sh
