#!/bin/bash
# Multi-host pod launch (the reference's launch_horovod.sh/launch_torch.sh
# role). On a Cloud TPU pod slice every host runs the SAME program and
# jax.distributed wires the global mesh; there is no mpirun/ssh loop —
# start this script once per host (e.g. with `gcloud compute tpus tpu-vm
# ssh --worker=all --command=...`) and set:
#
#   KFB_COORDINATOR   host:port of worker 0 (omit on Cloud TPU — the TPU
#                     environment auto-detects; required for CPU testing)
#   KFB_NUM_PROCESSES number of hosts
#   KFB_PROCESS_ID    this host's index
#
# Everything else matches launch/train_imagenet.sh's env-var surface.
# Validated end-to-end by tests/test_multiprocess.py (two localhost
# processes, 4 simulated devices each, global 8-device mesh).

model="${model:-imagenet-resnet50}"
batch_size="${batch_size:-32}"
kfac_name="${kfac_name:-eigen_dp}"
epochs="${epochs:-55}"
damping="${damping:-0.002}"
extra="${extra:-}"

exec python "$(dirname "$0")/../examples/train_imagenet.py" \
    --model "$model" \
    --batch-size "$batch_size" \
    --kfac-name "$kfac_name" \
    --epochs "$epochs" \
    --damping "$damping" \
    --num-processes "${KFB_NUM_PROCESSES:-1}" \
    --process-id "${KFB_PROCESS_ID:-0}" \
    ${KFB_COORDINATOR:+--coordinator "$KFB_COORDINATOR"} \
    $extra
