#!/usr/bin/env bash
# 8-chip data-parallel training (the reference's dist_train.sh equivalent).
# Single-controller JAX: one process drives every local chip through a
# Mesh(('data',)); no torchrun/NCCL process groups needed. On a multi-host
# pod slice, launch this same command on every host (JAX initializes the
# distributed runtime from the TPU environment automatically).
set -e
CONFIG=${1:-racformer_tpu/configs/racformer_r50_nuimg_704x256_f8.py}
shift || true
exec python train.py --config "$CONFIG" "$@"
