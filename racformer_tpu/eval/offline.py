"""Batched offline evaluation over the data mesh, shared by the val driver
and train.py's in-training periodic eval.

This is the TPU-native `multi_gpu_test` + rank-0 gather
(`/root/reference/val.py:134-137`): one jitted program over
`Mesh(('data',))`, predictions fetched to host per chunk, tail padded with
the last sample and dropped after decode. The in-training use mirrors the
reference's `DistEvalHook` registration + `evaluation = dict(interval=2)`
(`/root/reference/train.py:147-172`,
`/root/reference/configs/racformer_r50_nuimg_704x256_f8.py:334`).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np

ARG_KEYS = ("imgs", "radar_points", "radar_mask", "radar_depth", "radar_rcs",
            "lidar2img", "img2lidar", "time_diff")

_GT_OPTIONAL = (("gt_attrs", "attrs"), ("gt_num_pts", "num_pts"),
                ("ego_xy", "ego_xy"), ("gt_in_bikerack", "in_bikerack"),
                ("gt_bikeracks", "bikeracks"))


def gather_gt(sample_batch: Dict, j: int) -> Optional[Dict]:
    """Extract sample j's ground-truth dict (metrics.py schema) from a
    collated batch; None when the dataset carries no GT."""
    if "gt_bboxes" not in sample_batch:
        return None
    g = dict(bboxes=sample_batch["gt_bboxes"][j],
             labels=sample_batch["gt_labels"][j],
             mask=sample_batch["gt_mask"][j])
    for src, dst in _GT_OPTIONAL:
        if src in sample_batch:
            g[dst] = sample_batch[src][j]
    return g


def gather_gt_sample(s: Dict) -> Optional[Dict]:
    """`gather_gt` for one UNCOLLATED sample dict — the single extraction
    point for the per-sample eval loops (val.py single-stream, streaming
    multi-stream), so the metrics GT schema has exactly two readers: this
    and the collated `gather_gt`."""
    if "gt_bboxes" not in s:
        return None
    g = dict(bboxes=s["gt_bboxes"], labels=s["gt_labels"], mask=s["gt_mask"])
    for src, dst in _GT_OPTIONAL:
        if src in s:
            g[dst] = s[src]
    return g


class OfflineEvaluator:
    """Jit-once, run-many sharded predict: train.py builds one of these and
    reuses it every eval epoch so the predict program compiles once."""

    def __init__(self, model, eval_cfg: Optional[Dict] = None,
                 batch_per_chip: int = 1):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from ..model import preprocess_images
        from .decode import decode_boxes

        self._jax = jax
        ecfg = dict(eval_cfg or {})
        devices = np.asarray(jax.devices())
        self.mesh = Mesh(devices, ("data",))
        self.shard = NamedSharding(self.mesh, P("data"))
        self.batch = max(1, int(batch_per_chip)) * len(devices)

        def predict(variables, b):
            outs = model.apply(
                variables, preprocess_images(b["imgs"]),
                *[b[k] for k in ARG_KEYS[1:]],
            )
            return decode_boxes(
                outs["all_cls_scores"][-1], outs["all_bbox_preds"][-1],
                max_num=ecfg.get("max_num", 300),
                score_threshold=ecfg.get("score_threshold", 0.05),
                post_center_range=tuple(ecfg.get(
                    "post_center_range",
                    (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0))),
                legacy_version=ecfg.get("legacy_version", "v1.0.0"),
            )

        # outputs come back REPLICATED: the decoded boxes are tiny
        # ([B, max_num, ~10]), so the in-graph all-gather is free, and a
        # replicated jax.Array is addressable on EVERY host — `device_get`
        # on a P('data')-sharded output would raise on a multi-host pod
        # (it spans non-addressable devices), which would kill train.py's
        # in-training eval at the first eval boundary.
        repl = NamedSharding(self.mesh, P())
        self._repl = repl
        self._predict = jax.jit(
            predict,
            in_shardings=(repl, {k: self.shard for k in ARG_KEYS}),
            out_shardings=repl,
        )

    def run(self, variables, dataset, max_samples: Optional[int] = None
            ) -> Tuple[List[Dict], List[Dict], float]:
        """Returns (preds, gts, samples_per_sec). `variables` may live on
        device already (in-training eval passes the live replicated params).

        Multi-host: every process loads ONLY its rows of each global batch
        (assembled with `make_array_from_process_local_data`, the same row
        layout as train's hostdata); predictions come back replicated and GT
        rows are allgathered host-side, so EVERY process returns the full
        (preds, gts) — the collective best-checkpoint save and the metrics
        then agree across processes by construction."""
        import jax

        num = len(dataset)
        if max_samples:
            num = min(num, int(max_samples))
        preds: List[Dict] = []
        gts: List[Dict] = []
        t_total, n = 0.0, 0
        B = self.batch
        n_proc = jax.process_count()
        # B = batch_per_chip * device_count; a non-divisible B would silently
        # misalign the lo/local row slicing of preds against GT on a pod
        assert B % n_proc == 0, (B, n_proc)
        local = B // n_proc
        lo = jax.process_index() * local
        if n_proc > 1:
            # host-loaded checkpoints (val.py standalone) are process-local
            # leaves; a multi-host jit needs GLOBAL replicated arrays. Every
            # process holds the same checkpoint, so its local copy IS the
            # replicated shard. Live train params are already global — pass
            # them through untouched.
            def _glob(x):
                if isinstance(x, jax.Array) and not x.is_fully_addressable:
                    return x
                return jax.make_array_from_process_local_data(
                    self._repl, np.asarray(x))

            variables = jax.tree.map(_glob, variables)
        for start in range(0, num, B):
            valid = min(start + B, num) - start
            idxs = list(range(start, start + valid))
            idxs += [idxs[-1]] * (B - valid)
            sb = dataset.batch(idxs[lo:lo + local])
            b = {k: jax.make_array_from_process_local_data(
                     self.shard, np.asarray(sb[k])) for k in ARG_KEYS}
            t0 = time.perf_counter()
            out = self._predict(variables, b)
            jax.block_until_ready(out)
            if start > 0:  # skip the compile chunk
                t_total += time.perf_counter() - t0
                n += valid
            out = jax.device_get(out)
            gb = sb
            if n_proc > 1 and "gt_bboxes" in sb:
                from jax.experimental import multihost_utils

                gkeys = [k for k in ("gt_bboxes", "gt_labels", "gt_mask",
                                     *[s for s, _ in _GT_OPTIONAL]) if k in sb]
                gb = multihost_utils.process_allgather(
                    {k: np.asarray(sb[k]) for k in gkeys})
                # [n_proc, local, ...] in process order -> global [B, ...];
                # cast back to the host dtype — the allgather routes through
                # JAX, which silently downcasts 64-bit dtypes (e.g. int64
                # gt_labels) without jax_enable_x64
                gb = {k: np.asarray(v).reshape((-1,) + v.shape[2:])
                         .astype(np.asarray(sb[k]).dtype)
                      for k, v in gb.items()}
            for j in range(valid):
                preds.append({k: v[j] for k, v in out.items()})
                g = gather_gt(gb, j)
                if g is not None:
                    gts.append(g)
        return preds, gts, (n / t_total if t_total > 0 else 0.0)


def label_pred_attributes(preds: List[Dict], class_names) -> None:
    """Attach predicted attributes in-place via mmdet3d's velocity-aware rule
    (the convention behind the reference's devkit submissions), coded into
    the same vocabulary as the baked GT attributes."""
    from ..tools.export_results import attribute_for
    from ..tools.gen_sweep_info import ATTRIBUTES

    names = list(class_names)
    for p in preds:
        boxes = np.asarray(p["bboxes"])
        labels = np.asarray(p["labels"])
        p["attrs"] = np.asarray([
            ATTRIBUTES.index(attribute_for(
                names[int(l)], float(b[7]), float(b[8])))
            for b, l in zip(boxes, labels)
        ], np.int32)


def detection_metrics(preds: List[Dict], gts: List[Dict], *,
                      is_vod: bool = False, class_names=None,
                      front_only: bool = False, return_curves: bool = False,
                      gt_filter=None) -> Dict:
    """Protocol dispatch shared by val.py and in-training eval: VoD KITTI
    metrics or nuScenes NDS/mAP (with predicted-attribute labeling when the
    config provides class names)."""
    if is_vod:
        from .kitti_eval import kitti_vod_metrics

        vp = [
            {"bboxes": np.asarray(p["bboxes"])[np.asarray(p["valid"], bool)][:, :7],
             "scores": np.asarray(p["scores"])[np.asarray(p["valid"], bool)],
             "labels": np.asarray(p["labels"])[np.asarray(p["valid"], bool)]}
            for p in preds
        ]
        vg = [{"bboxes": np.asarray(g["bboxes"])[np.asarray(g["mask"], bool), :7],
               "labels": np.asarray(g["labels"])[np.asarray(g["mask"], bool)]}
              for g in gts]
        return kitti_vod_metrics(vp, vg)

    from .metrics import nuscenes_metrics

    if class_names:
        label_pred_attributes(preds, class_names)
    return nuscenes_metrics(preds, gts, front_only=front_only,
                            return_curves=return_curves, gt_filter=gt_filter)
