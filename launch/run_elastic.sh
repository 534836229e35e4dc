#!/bin/bash
# Elastic supervisor: restart a training harness on crash, resuming from
# the latest checkpoint. The reference has NO failure handling (crash =
# rerun by hand + scripts/kill_remote_process.sh cleanup); here every
# harness already scans its --checkpoint-dir for the newest epoch on
# startup (examples/train_imagenet.py:189-202, orbax atomic-commit
# checkpoints incl. K-FAC factor state), so a supervisor loop is all the
# elasticity a single-controller JAX job needs: preemption, OOM, or a
# wedged TPU claim kill the process, and the next attempt resumes
# bit-exact from the last committed epoch.
#
# Usage:
#   max_restarts=5 backoff=10 ./launch/run_elastic.sh \
#       python examples/train_imagenet.py --checkpoint-dir /tmp/ck \
#       --async-checkpoint --epochs 55 ...
#
# Exit codes: the wrapped command's final exit code (0 on success);
# gives up after max_restarts consecutive failures.

set -u
max_restarts="${max_restarts:-5}"
backoff="${backoff:-10}"

if [ "$#" -eq 0 ]; then
    echo "usage: $0 <training command...>" >&2
    exit 2
fi

attempt=0
while :; do
    "$@"
    rc=$?
    if [ "$rc" -eq 0 ]; then
        echo "[elastic] run completed cleanly" >&2
        exit 0
    fi
    attempt=$((attempt + 1))
    if [ "$attempt" -gt "$max_restarts" ]; then
        echo "[elastic] giving up after $max_restarts restarts (rc=$rc)" >&2
        exit "$rc"
    fi
    echo "[elastic] crash (rc=$rc); restart $attempt/$max_restarts in ${backoff}s" >&2
    sleep "$backoff"
done
