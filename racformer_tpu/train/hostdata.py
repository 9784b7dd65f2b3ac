"""Multi-host input partitioning.

The reference trains with torch DDP + DistributedGroupSampler (one rank per
GPU, `/root/reference/train.py:93,140`); the TPU-native equivalent is a
deterministic per-process slice of each global batch: every process loads
only its `global_batch / process_count` samples and contributes them to the
globally-sharded array via `jax.make_array_from_process_local_data`
(train.py `put_batch`). This module holds the pure index math so it is
testable without a multi-process runtime.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def epoch_order(seed: int, epoch: int, n: int) -> np.ndarray:
    """Per-epoch dataset permutation, derived purely from (seed, epoch).

    Every process computes the same order with zero communication — the
    TPU-native equivalent of `DistributedGroupSampler.set_epoch`
    (`/root/reference/loaders/builder.py:19-28`), which reshuffles the
    sampler each epoch so no two epochs see identical batch composition.
    Deterministic under resume: re-deriving epoch e's order after a restart
    yields the same permutation the interrupted run used.
    """
    return np.random.default_rng((int(seed), int(epoch))).permutation(n)


def host_batch_indices(
    order: Sequence[int],
    step: int,
    global_batch: int,
    n_proc: int,
    proc_idx: int,
) -> list:
    """Dataset indices this process loads for `step`.

    The union over proc_idx in [0, n_proc) is exactly the contiguous window
    `order[step*global_batch : (step+1)*global_batch]` (wrapping), disjoint
    across processes and ordered so process p holds global batch rows
    [p*local, (p+1)*local) — matching the row layout
    `make_array_from_process_local_data` assembles.
    """
    if global_batch % n_proc:
        raise ValueError(f"global_batch {global_batch} not divisible by "
                         f"process_count {n_proc}")
    local = global_batch // n_proc
    off = proc_idx * local
    n = len(order)
    return [int(order[(step * global_batch + off + i) % n])
            for i in range(local)]


def host_local_rows(x) -> np.ndarray:
    """Host copy of THIS process's rows of a batch-sharded `jax.Array`.

    On a multi-host pod, `jax.device_get` on a P('data')-sharded global array
    raises (it spans non-addressable devices); the addressable shards are
    exactly this process's contribution from `host_batch_indices` /
    `make_array_from_process_local_data`, i.e. global rows
    [proc_idx*local, (proc_idx+1)*local). Shards are concatenated in global
    row order. Used by train.py's match-stats flush for per-rank dumps.
    """
    shards = sorted(
        x.addressable_shards,
        key=lambda s: s.index[0].start if s.index[0].start else 0,
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
