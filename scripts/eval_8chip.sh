#!/usr/bin/env bash
# Multi-chip evaluation (the reference's dist_test.sh / multi_gpu_test
# equivalent). val.py shards the val set over a Mesh(('data',)) spanning all
# visible chips — one jitted program, predictions gathered to host per chunk;
# --batch-size N gives N samples per chip per step.
set -e
CONFIG=${1:-racformer_tpu/configs/racformer_r50_nuimg_704x256_f8.py}
shift || true
exec python val.py --config "$CONFIG" --batch-size "${BATCH_PER_CHIP:-1}" "$@"
