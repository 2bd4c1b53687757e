#!/usr/bin/env bash
# Job-level relaunch-on-failure: the framework's counterpart of the
# reference's hydra submitit launcher with `max_num_timeout: 3`
# (/root/reference/src/benchmark/configs/pretrain_config.yaml:1-19), which
# resubmits a preempted/timed-out SLURM job. There is no scheduler here, so
# the equivalent is process-level: re-exec the given CP command on non-zero
# exit, appending resume=True so the run restarts from the latest
# ResumeCheckpointer snapshot (train/checkpoints.py — epoch, params,
# optimizer state, RNG position) instead of from scratch.
#
# Usage:
#   scripts/run_with_retry.sh [-n MAX_RETRIES] python -m \
#       heart_murmur_detection_tpu.cli.pretrain circor=True encoder=htsat ...
#
# MAX_RETRIES defaults to 3 (the reference's max_num_timeout).
set -u

MAX_RETRIES=3
if [ "${1:-}" = "-n" ]; then
  MAX_RETRIES="$2"
  shift 2
fi

attempt=0
"$@"
rc=$?
while [ $rc -ne 0 ] && [ $attempt -lt "$MAX_RETRIES" ]; do
  attempt=$((attempt + 1))
  echo "[run_with_retry] attempt $attempt/$MAX_RETRIES (rc=$rc): relaunching with resume=True" >&2
  "$@" resume=True
  rc=$?
done
exit $rc
