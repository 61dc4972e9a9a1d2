#!/usr/bin/env bash
# Multi-host TPU pod launch — replaces the reference's AWS fleet machinery
# (scripts/launch.py EC2 master + worker ASGs, scripts/ec2ctl). On Cloud TPU
# pods, run this same command on EVERY host of the slice (e.g. via
# `gcloud compute tpus tpu-vm ssh --worker=all --command=...`); JAX
# auto-discovers the coordinator. For manual clusters set:
#   JAX_COORDINATOR_ADDRESS=<host0>:8476 JAX_NUM_PROCESSES=N JAX_PROCESS_ID=i
#
# Usage: ./scripts/pod_run.sh <algo> <exp_file.json> [log_dir]
set -euo pipefail
ALGO=${1:?algo}
EXP=${2:?experiment json}
LOG=${3:-logs/$(basename "$EXP" .json)}
exec python -m deep_neuroevolution_tpu.main train \
    --algo "$ALGO" --exp_file "$EXP" --log_dir "$LOG" --snapshot_freq 10
