#!/bin/bash
# Hyper-parameter sweep driver: damping x K-FAC update-frequency grid.
# Equivalent of the reference's batch-hyper.sh:6-28 (ResNet-110 CIFAR-10,
# eigen / eigen_dp), emitting one parseable log per cell for
# tools/parse_logs.py. The reference fans out over cluster nodes via
# node_rank; a single TPU host runs the grid serially (one chip, one claim).
#
# Usage:
#   ./batch-hyper.sh                      # full grid, full schedule
#   smoke=1 ./batch-hyper.sh              # 20-iteration smoke grid
#   kfac_name=eigen_dp ./batch-hyper.sh
set -e
cd "$(dirname "$0")"

kfac_name="${kfac_name:-eigen}"
model="${model:-resnet110}"
logdir="${logdir:-../logs/hyper}"
mkdir -p "$logdir"

dampings="${dampings:-0.005 0.01 0.05 0.1}"
freqs="${freqs:-1 10 50 100}"

if [ -n "${smoke:-}" ]; then
  extra_args="--iters 20 --epochs 1"
  epochs=1
else
  extra_args=""
  epochs="${epochs:-100}"
fi

for freq in $freqs; do
  for damping in $dampings; do
    log="$logdir/${model}_${kfac_name}_fac${freq}_kfac${freq}_damping${damping}.log"
    echo "=== kfac_name=$kfac_name fac=$freq kfac=$freq damping=$damping -> $log"
    model="$model" kfac_name="$kfac_name" fac="$freq" kfac="$freq" \
      damping="$damping" epochs="$epochs" \
      extra="$extra_args ${extra:-}" \
      ./train_cifar10.sh 2>&1 | tee "$log"
  done
done

echo "grid complete; parse with: python tools/parse_logs.py $logdir/*.log"
