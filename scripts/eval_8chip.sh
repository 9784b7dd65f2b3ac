#!/usr/bin/env bash
# Multi-chip evaluation (dist_test.sh equivalent).
set -e
CONFIG=${1:-racformer_tpu/configs/racformer_r50_nuimg_704x256_f8.py}
shift || true
exec python val.py --config "$CONFIG" "$@"
