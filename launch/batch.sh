#!/bin/bash
# Experiment driver (reference batch.sh): convergence + efficiency recipes.
set -e
cd "$(dirname "$0")"

# Convergence performance (full schedules; accuracy read from logs)
# model=resnet110 epochs=165 lr_decay="82 123" kfac=1 ./train_cifar10.sh
# model=resnet110 epochs=165 lr_decay="82 123" kfac=0 ./train_cifar10.sh   # SGD arm

# Training efficiency (short SPEED runs with stage timers)
for kn in eigen_dp inverse_dp eigen inverse; do
  kfac_name=$kn extra="--iters 60 --speed" ./train_cifar10.sh
done
kfac=0 extra="--iters 60 --speed" ./train_cifar10.sh

# Stage-exclusion ablations (reference base.py:96-99 time breakdown)
for part in ComputeFactor ComputeInverse; do
  exclude_parts=$part extra="--iters 60 --speed" ./train_cifar10.sh
done
