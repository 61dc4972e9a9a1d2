#!/usr/bin/env bash
# Local single-host launch — replaces the reference's tmux + dual-redis
# orchestration (scripts/local_run_redis.sh + local_run_exp.sh): with the
# Redis fabric gone there is nothing to pre-start; one process is the whole
# topology.
#
# Usage: ./scripts/local_run_exp.sh <algo> <exp_file.json> [log_dir]
set -euo pipefail
ALGO=${1:?algo (es|ga|rs|nses)}
EXP=${2:?experiment json}
LOG=${3:-logs/$(basename "$EXP" .json)}
exec python -m deep_neuroevolution_tpu.main train \
    --algo "$ALGO" --exp_file "$EXP" --log_dir "$LOG" --snapshot_freq 10
