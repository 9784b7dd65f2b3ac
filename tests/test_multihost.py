"""Multi-host training mechanics.

Two layers of coverage for the DDP-replacement path
(ref `/root/reference/train.py:93,140` — NCCL DDP + DistributedGroupSampler):

1. pure index math: `host_batch_indices` partitions each global batch
   disjointly and in global row order across processes;
2. a REAL 2-process `jax.distributed` run on CPU exercising
   `jax.make_array_from_process_local_data` + a global-mean jit — the exact
   mechanic train.py's `put_batch` uses on multi-host TPU pods.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from racformer_tpu.train.hostdata import epoch_order, host_batch_indices


def test_epoch_order_reshuffles_and_is_cross_process_consistent():
    """DistributedGroupSampler.set_epoch equivalent
    (`/root/reference/loaders/builder.py:19-28`): consecutive epochs see
    different orders, every process derives the identical permutation, and
    the per-step windows tile the epoch disjointly."""
    n, gb, n_proc = 37, 8, 4
    o0, o1 = epoch_order(0, 0, n), epoch_order(0, 1, n)
    assert sorted(o0) == list(range(n)) and sorted(o1) == list(range(n))
    assert list(o0) != list(o1)  # epochs reshuffle
    assert list(epoch_order(0, 1, n)) == list(o1)  # deterministic (resume)
    assert list(epoch_order(1, 0, n)) != list(o0)  # seed-dependent
    steps_per_epoch = n // gb
    seen = []
    for step in range(steps_per_epoch):
        for p in range(n_proc):
            seen += host_batch_indices(o1, step, gb, n_proc, p)
    assert len(seen) == len(set(seen))  # within-epoch windows are disjoint


def test_host_batch_indices_partition():
    order = np.random.default_rng(0).permutation(37)
    gb, n_proc = 8, 4
    for step in (0, 1, 4, 11):
        got = []
        for p in range(n_proc):
            part = host_batch_indices(order, step, gb, n_proc, p)
            assert len(part) == gb // n_proc
            got.extend(part)
        want = [int(order[(step * gb + i) % 37]) for i in range(gb)]
        assert got == want  # disjoint, globally ordered, wrapping


def test_host_batch_indices_divisibility():
    with pytest.raises(ValueError):
        host_batch_indices(np.arange(8), 0, 6, 4, 0)


_WORKER = textwrap.dedent("""
    import sys, os
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, port = int(sys.argv[1]), sys.argv[2]
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    import numpy as np, jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from racformer_tpu.train.hostdata import host_batch_indices

    mesh = Mesh(np.array(jax.devices()).reshape(2), ("data",))
    shard = NamedSharding(mesh, P("data"))
    order = np.arange(10)
    rows = host_batch_indices(order, step=1, global_batch=2, n_proc=2,
                              proc_idx=pid)
    local = np.asarray(rows, np.float32).reshape(1, 1) * np.ones((1, 4),
                                                                 np.float32)
    g = jax.make_array_from_process_local_data(shard, local)
    assert g.shape == (2, 4)
    mean = jax.jit(jnp.mean, out_shardings=NamedSharding(mesh, P()))(g)
    # step 1, gb 2 -> global rows order[2:4] = [2, 3]; mean 2.5
    print("MEAN", pid, float(mean), flush=True)

    # match-stats flush mechanic: device_get on the sharded global array
    # raises on multi-host, host_local_rows returns exactly this process's
    # rows (train.py's per-rank match dumps rely on both)
    from racformer_tpu.train.hostdata import host_local_rows
    try:
        jax.device_get(g)
        fetched_global = True
    except RuntimeError:
        fetched_global = False
    loc = host_local_rows(g)
    assert loc.shape == (1, 4)
    assert np.allclose(loc, local), (pid, loc, local)
    print("LOCALROWS", pid, int(loc[0, 0]), "global_fetch", fetched_global,
          flush=True)
""")


_EVAL_WORKER = textwrap.dedent("""
    import sys, os
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, port = int(sys.argv[1]), sys.argv[2]
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    import numpy as np, jax.numpy as jnp
    from racformer_tpu.eval.offline import ARG_KEYS, OfflineEvaluator

    # stub detector: the top class logit of every sample is its dataset
    # index (smuggled through time_diff, which predict() passes untouched),
    # so output row order proves the local-rows -> global assembly
    class StubModel:
        def apply(self, v, imgs, *rest):
            val = rest[-1][:, 0]                       # time_diff = index
            B = val.shape[0]
            cls = jnp.full((1, B, 3, 2), -10.0)
            cls = cls.at[0, :, 0, 0].set(val)
            bbox = jnp.zeros((1, B, 3, 10))
            return {"all_cls_scores": cls, "all_bbox_preds": bbox}

    class DS:
        def __len__(self):
            return 5

        def batch(self, idxs):
            n, i = len(idxs), np.asarray(idxs, np.float32)
            b = {k: np.zeros((n, 2), np.float32) for k in ARG_KEYS}
            b["imgs"] = np.zeros((n, 1, 4, 4, 3), np.float32)
            b["time_diff"] = np.tile(i[:, None], (1, 2))
            b["gt_bboxes"] = np.tile(i[:, None, None], (1, 2, 9))
            b["gt_labels"] = np.zeros((n, 2), np.int64)
            b["gt_mask"] = np.ones((n, 2), bool)
            return b

    ev = OfflineEvaluator(StubModel())     # B = 1/chip x 2 devices = 2
    preds, gts, _ = ev.run({"params": np.zeros((2,), np.float32)}, DS())
    assert len(preds) == 5 and len(gts) == 5, (len(preds), len(gts))
    for j in range(5):
        # top score = sigmoid(index): rows came back in global order
        want = 1.0 / (1.0 + np.exp(-j))
        assert abs(float(preds[j]["scores"][0]) - want) < 1e-5, (j, preds[j])
        assert np.all(gts[j]["bboxes"] == j), (j, gts[j])
    print("EVALOK", pid, flush=True)
""")


@pytest.mark.slow
def test_two_process_offline_evaluator(tmp_path):
    """The in-training eval path on a real 2-process run: per-process local
    rows in, replicated predictions out (device_get works on BOTH hosts),
    GT allgathered in global row order — the exact mechanics that crashed
    multi-host training before eval/offline.py went process-local."""
    script = tmp_path / "eval_worker.py"
    script.write_text(_EVAL_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS="",
               PYTHONPATH=os.pathsep.join(sys.path))  # 1 CPU device/process
    procs = [subprocess.Popen([sys.executable, str(script), str(i), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    for i, out in enumerate(outs):
        assert f"EVALOK {i}" in out, out


@pytest.mark.slow
def test_two_process_distributed_put_batch(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS="",
               PYTHONPATH=os.pathsep.join(sys.path))  # 1 CPU device/process
    procs = [subprocess.Popen([sys.executable, str(script), str(i), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    for i, out in enumerate(outs):
        assert f"MEAN {i} 2.5" in out, out
        # step 1, gb 2: process i's local row is order[2 + i] = 2 + i
        assert f"LOCALROWS {i} {2 + i}" in out, out
