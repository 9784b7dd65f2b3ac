"""Streaming inference: per-frame feature cache in HBM.

The TPU-primary eval path (SURVEY.md §3.2): equivalent of the reference's
`simple_test_online` (`/root/reference/models/racformer.py:476-557`), which
caches per-frame image/BEV/radar-BEV features keyed by filename so each new
sample computes only one new frame. Here the cache is a fixed ring buffer of
jnp arrays (newest frame at index 0), and both the single-frame encoder and
the windowed decoder are jitted once.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..model.racformer import RaCFormer, preprocess_images
from .decode import decode_boxes
from .offline import gather_gt_sample


class StreamingEvaluator:
    def __init__(self, model: RaCFormer, variables, eval_cfg: Optional[Dict] = None,
                 mesh: Optional[jax.sharding.Mesh] = None):
        self.model = model
        self.variables = variables
        self.T = model.num_frames
        self.cache = None  # (fpn list, lss, radar, lidar2img, ts) — device pytree
        self.mesh = mesh
        self._sharding = (
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
            if mesh is not None else None)
        ecfg = eval_cfg or {}

        def encode(v, imgs, radar_points, radar_mask, radar_depth, radar_rcs,
                   img2lidar):
            # the radar rasterizer writes whole COLUMNS (no-elevation smear,
            # data/depth_maps.py:radar_to_depth_rcs_maps), so the dense
            # [S, N, H, W] maps carry only [S, N, W] of information. Accept
            # the column form and broadcast on device — this cuts the
            # per-frame host->device payload by ~8.6 MB (measured 320 ms of
            # the 515 ms streaming step was tunnel transfer,
            # docs/experiments/overhead_split.py).
            H = imgs.shape[2]
            if radar_depth.ndim == 3:
                S, N, W = radar_depth.shape
                radar_depth = jnp.broadcast_to(
                    radar_depth[:, :, None, :], (S, N, H, W))
            if radar_rcs.ndim == 3:
                S, N, W = radar_rcs.shape
                radar_rcs = jnp.broadcast_to(
                    radar_rcs[:, :, None, :], (S, N, H, W))
            fpn, lss, radar, _ = model.apply(
                v, preprocess_images(imgs), radar_points, radar_mask,
                radar_depth, radar_rcs, img2lidar, method=model.encode_frame,
            )
            return fpn, lss, radar

        def init_cache(feats, lidar2img, ts):
            # bootstrap: duplicate the first frame across the window (the
            # reference pads missing history with the first frame,
            # `loaders/pipelines/loading.py:668-676`)
            fpn, lss, radar = feats
            T = self.T
            return (
                [jnp.repeat(f[:, None], T, axis=1) for f in fpn],
                jnp.repeat(lss[:, None], T, axis=1),
                jnp.repeat(radar[:, None], T, axis=1),
                jnp.repeat(lidar2img[:, None], T, axis=1),
                jnp.full((1, T), ts),
            )

        def decode(outs):
            # the ONE box-decode configuration point: single-stream and
            # multi-stream paths decode through this closure, so an eval_cfg
            # knob (or a decode fix) cannot apply to one protocol and not
            # the other
            return decode_boxes(
                outs["all_cls_scores"][-1], outs["all_bbox_preds"][-1],
                max_num=ecfg.get("max_num", 300),
                score_threshold=ecfg.get("score_threshold", 0.05),
                post_center_range=tuple(ecfg.get(
                    "post_center_range", (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0))),
                legacy_version=ecfg.get("legacy_version", "v1.0.0"),
            )

        def shift_decode(v, cache, feats, lidar2img, ts, reset=None):
            # window shift (newest at index 0) fused with the decoder so no
            # eager per-step device ops remain. `ts` carries a leading [B]
            # stream axis. With `reset`, per-stream scene boundaries are
            # handled IN-GRAPH: a resetting stream re-bootstraps its window
            # from the new frame exactly as the single-stream bootstrap does
            # (duplicate-first padding, `loaders/pipelines/loading.py:668-676`)
            # so the B=1 lockstep matches `step()` bit-for-bit.
            fpn, lss, radar = feats
            cfpn, clss, cradar, cl2i, cts = cache
            T = self.T

            def window(new, old):
                shifted = jnp.concatenate([new[:, None], old[:, : T - 1]], 1)
                if reset is None:
                    return shifted
                boot = jnp.repeat(new[:, None], T, axis=1)
                r = reset.reshape((-1,) + (1,) * (shifted.ndim - 1))
                return jnp.where(r, boot, shifted)

            fpn_w = [window(f, cf) for f, cf in zip(fpn, cfpn)]
            lss_w = window(lss, clss)
            radar_w = window(radar, cradar)
            l2i_w = window(lidar2img, cl2i)
            ts_w = window(ts, cts)
            new_cache = (fpn_w, lss_w, radar_w, l2i_w, ts_w)

            time_diff = (ts_w[:, :1] - ts_w).astype(jnp.float32)
            outs = model.apply(
                v, fpn_w, lss_w, radar_w, l2i_w, time_diff,
                method=model.decode_window,
            )
            return new_cache, decode(outs)

        def update_decode(v, cache, feats, lidar2img, ts):
            return shift_decode(v, cache, feats, lidar2img,
                                jnp.reshape(ts, (1,)))

        def fused_step(v, cache, imgs, radar_points, radar_mask, radar_depth,
                       radar_rcs, lidar2img, img2lidar, ts):
            # steady-state path: ONE dispatch per frame (encode + window
            # shift + decode + box decode); one host->device round-trip less
            # than the two-program bootstrap path, same math by construction
            feats = encode(v, imgs, radar_points, radar_mask, radar_depth,
                           radar_rcs, img2lidar)
            return update_decode(v, cache, feats, lidar2img, ts)

        def fused_step_multi(v, cache, imgs, radar_points, radar_mask,
                             radar_depth, radar_rcs, lidar2img, img2lidar,
                             ts, reset):
            # multi-stream form: B independent scene streams ride the batch
            # axis; the batch axis shards over a data mesh (each chip runs
            # its own streams with batch-local gathers).
            feats = encode(v, imgs, radar_points, radar_mask, radar_depth,
                           radar_rcs, img2lidar)
            return shift_decode(v, cache, feats, lidar2img, ts, reset)

        self._encode = jax.jit(encode)
        self._init_cache = jax.jit(init_cache)
        self._update_decode = jax.jit(update_decode, donate_argnums=(1,))
        self._fused_step = jax.jit(fused_step, donate_argnums=(1,))
        self._fused_step_multi = jax.jit(fused_step_multi, donate_argnums=(1,))

    def reset(self):
        """Call at scene boundaries (a new scene must not see old frames)."""
        self.cache = None

    def step(self, frame: Dict, blocking: bool = True) -> Dict:
        """frame: dict with imgs [N, H, W, 3] (raw 0-255; uint8 preferred —
        it is the pipeline-native form and 4x cheaper to upload),
        radar_points [P, 7], radar_mask [P], radar_depth/rcs [N, H, W]
        dense maps OR [N, W] column maps (the rasterizer's true payload),
        lidar2img [N, 4, 4], img2lidar [N, 4, 4], timestamp (float seconds,
        RELATIVE to the scene start — epoch-seconds have a 128 s float32
        ULP, which would quantize inter-frame time_diff to 0 on device;
        val.py rebases).

        Returns decoded boxes for the current frame.
        """
        if abs(float(frame["timestamp"])) > 1e6:
            raise ValueError(
                "timestamp looks absolute (epoch seconds); pass scene-"
                "relative seconds — float32 on device cannot resolve "
                "sub-second deltas at ~1e9 magnitudes")
        b = lambda x: jnp.asarray(x)[None]
        l2i = b(frame["lidar2img"])
        ts = jnp.float32(frame["timestamp"])

        if self.cache is None:
            feats = self._encode(
                self.variables, b(frame["imgs"]), b(frame["radar_points"]),
                b(frame["radar_mask"]), b(frame["radar_depth"]),
                b(frame["radar_rcs"]), b(frame["img2lidar"]),
            )
            self.cache = self._init_cache(feats, l2i, ts)
            self.cache, out = self._update_decode(
                self.variables, self.cache, feats, l2i, ts)
        else:
            self.cache, out = self._fused_step(
                self.variables, self.cache, b(frame["imgs"]),
                b(frame["radar_points"]), b(frame["radar_mask"]),
                b(frame["radar_depth"]), b(frame["radar_rcs"]), l2i,
                b(frame["img2lidar"]), ts,
            )
        return jax.device_get(out) if blocking else out

    def _zero_cache(self, args):
        """Zero ring buffer of the right shapes (host-cheap via eval_shape;
        never read — every stream's first step carries reset=True, which
        overwrites its whole window in-graph)."""
        feats = jax.eval_shape(self._encode, self.variables, *args[:6])
        T, B = self.T, args[0].shape[0]

        def zeros(s):
            a = jnp.zeros((s.shape[0], T) + s.shape[1:], s.dtype)
            return (jax.device_put(a, self._sharding)
                    if self._sharding is not None else a)

        fpn, lss, radar = feats
        return ([zeros(f) for f in fpn], zeros(lss), zeros(radar),
                zeros(jax.ShapeDtypeStruct((B,) + args[6].shape[1:],
                                           args[6].dtype)),
                zeros(jax.ShapeDtypeStruct((B,), jnp.float32)))

    def step_batch(self, frames, resets: Sequence[bool],
                   blocking: bool = True) -> Dict:
        """Lockstep B independent scene streams (one frame each per call).

        frames: either B per-stream dicts with the `step()` field contract
        (each timestamp scene-relative to ITS stream's scene start), or ONE
        pre-batched dict whose values carry a leading [B] axis — the latter
        skips the host-side stack entirely, so device-resident batched
        inputs stay on device (np.asarray on a device array would round-trip
        it through the host). resets: B bools, True when that stream starts
        a new scene this step (frame 0 of every stream included). Returns
        the decoded dict with leading batch axis B. With a `mesh`, the batch
        axis is sharded over it — each device runs B/ndev streams with
        batch-local gathers (weak-scale throughput; the B=1 `step()` path
        stays the latency protocol).
        """
        field_keys = ("imgs", "radar_points", "radar_mask", "radar_depth",
                      "radar_rcs", "img2lidar", "lidar2img")
        if isinstance(frames, dict):
            ts = np.asarray(jax.device_get(frames["timestamp"]), np.float32)
            if np.abs(ts).max() > 1e6:
                raise ValueError(
                    "timestamps look absolute (epoch seconds); pass scene-"
                    "relative seconds (float32 ULP at ~1e9 is 128 s)")
            args = [frames[k] for k in field_keys]
            args.append(ts)
        else:
            for f in frames:
                if abs(float(f["timestamp"])) > 1e6:
                    raise ValueError(
                        "timestamp looks absolute (epoch seconds); pass "
                        "scene-relative seconds (float32 ULP at ~1e9 is "
                        "128 s)")
            stack = lambda k: np.stack([np.asarray(f[k]) for f in frames])
            args = [stack(k) for k in field_keys]
            args.append(np.asarray([f["timestamp"] for f in frames],
                                   np.float32))
        args.append(np.asarray(resets, bool))
        if self._sharding is not None:
            args = [jax.device_put(a, self._sharding) for a in args]
        else:
            args = [jnp.asarray(a) for a in args]
        (imgs, radar_points, radar_mask, radar_depth, radar_rcs, img2lidar,
         lidar2img, ts, reset) = args
        if self.cache is None:
            assert all(resets), "every stream must reset on its first step"
            self.cache = self._zero_cache(args)
        self.cache, out = self._fused_step_multi(
            self.variables, self.cache, imgs, radar_points, radar_mask,
            radar_depth, radar_rcs, lidar2img, img2lidar, ts, reset)
        return jax.device_get(out) if blocking else out


def sample_timestamp(sample: Dict, idx: int) -> float:
    """Absolute sample time in seconds; datasets without timestamps get the
    nuScenes keyframe cadence (2 Hz) so time_diff stays non-degenerate."""
    return float(sample.get("timestamp", idx * 0.5))


def prepare_frame(sample: Dict, ts_rel: float, use_radar_cols: bool) -> Dict:
    """Per-frame field prep shared by val.py's single-stream loop and the
    multi-stream runner: uint8-ify raw images (pipeline-native, 4x cheaper
    to upload), shrink column-constant radar maps to their [N, W] payload.
    `ts_rel` is the scene-relative timestamp, rebased by the caller in
    float64 (epoch-second float32 ULP is 128 s)."""
    imgs = sample["imgs"][0]
    if imgs.dtype != np.uint8 and imgs.max() > 1.0:
        imgs = np.clip(np.round(imgs), 0, 255).astype(np.uint8)
    rd, rr = sample["radar_depth"][0], sample["radar_rcs"][0]
    if use_radar_cols:
        rd, rr = rd[:, 0, :], rr[:, 0, :]
    return dict(
        imgs=imgs, radar_points=sample["radar_points"][0],
        radar_mask=sample["radar_mask"][0],
        radar_depth=rd, radar_rcs=rr,
        lidar2img=sample["lidar2img"][0],
        img2lidar=sample["img2lidar"][0],
        timestamp=ts_rel,
    )


def radar_maps_are_columns(sample: Dict) -> bool:
    """Column-constancy is a static property of the rasterizer
    (`data/depth_maps.py::radar_to_depth_rcs_maps` writes whole columns);
    decide once on one sample. Synthetic fixtures are dense and keep the
    [N, H, W] form."""
    rd, rr = sample["radar_depth"][0], sample["radar_rcs"][0]
    return bool(np.all(rd == rd[:, :1, :]) and np.all(rr == rr[:, :1, :]))


def _scene_groups(dataset) -> List[List[int]]:
    """Consecutive-run scene grouping from cheap metadata (`dataset.infos`
    scene tokens — loading samples just to read their scene id would decode
    every image twice). Datasets without scene metadata are one group."""
    n = len(dataset)
    infos = getattr(dataset, "infos", None)
    if infos is None:
        return [list(range(n))]
    groups, cur, prev = [], [], object()
    for i in range(n):
        tok = str(infos[i].get("scene_token", ""))
        if tok != prev and cur:
            groups.append(cur)
            cur = []
        cur.append(i)
        prev = tok
    if cur:
        groups.append(cur)
    return groups


def _assign_streams(groups: List[List[int]], streams: int,
                    ) -> List[List[List[int]]]:
    """Greedy longest-scene-first onto the least-loaded stream (scenes are
    independent, so per-stream scene order is free). A single giant group
    (no scene metadata) is split contiguously — the throughput protocol must
    insert stream boundaries somewhere."""
    if len(groups) == 1 and streams > 1:
        g = groups[0]
        k = (len(g) + streams - 1) // streams
        groups = [g[i: i + k] for i in range(0, len(g), k)]
    out: List[List[List[int]]] = [[] for _ in range(streams)]
    load = [0] * streams
    for g in sorted(groups, key=len, reverse=True):
        b = int(np.argmin(load))
        out[b].append(g)
        load[b] += len(g)
    return out


def run_multistream(ev: StreamingEvaluator, dataset, streams: int):
    """Throughput protocol: `streams` independent scene streams in lockstep
    through `StreamingEvaluator.step_batch` (the B=1 `step()` loop in val.py
    stays the latency protocol). Exhausted streams re-feed their last frame
    (output discarded) until the longest stream drains — the fixed batch
    shape is what keeps the one compiled program.

    Returns (preds ordered by dataset index, gts likewise, fps) where fps
    counts VALID frames only, excluding the compile step.
    """
    import time

    n = len(dataset)
    plan = _assign_streams(_scene_groups(dataset), streams)
    # drop streams that were assigned zero scenes (more streams than scene
    # groups, e.g. --streams 8 on a 2-scene mini split): an empty stream has
    # no frame to re-feed and would crash the lockstep with a None frame
    plan = [p for p in plan if p]
    if n == 0 or not plan:
        return [], [], 0.0
    if len(plan) < streams:
        print(f"streaming: only {len(plan)} scene groups — running "
              f"{len(plan)} streams instead of the requested {streams}")
        streams = len(plan)
    # flat per-stream (index, is_scene_start) tapes
    tapes = [[(i, j == 0) for g in sgroups for j, i in enumerate(g)]
             for sgroups in plan]
    max_len = max(len(t) for t in tapes)

    use_cols: Optional[bool] = None
    scene_t0 = [0.0] * streams
    last_frame: List[Optional[Dict]] = [None] * streams
    preds_by_idx: Dict[int, Dict] = {}
    gts_by_idx: Dict[int, Dict] = {}
    t_total, n_timed = 0.0, 0

    for t in range(max_len):
        frames, resets, valid_idx = [], [], []
        for b in range(streams):
            tape = tapes[b]
            if t < len(tape):
                idx, is_start = tape[t]
                s = dataset[idx]
                if use_cols is None:
                    use_cols = radar_maps_are_columns(s)
                ts_abs = sample_timestamp(s, idx)
                if is_start:
                    scene_t0[b] = ts_abs
                f = prepare_frame(s, ts_abs - scene_t0[b], use_cols)
                last_frame[b] = f
                frames.append(f)
                resets.append(is_start)
                valid_idx.append(idx)
                g = gather_gt_sample(s)
                if g is not None:
                    gts_by_idx[idx] = g
            else:
                frames.append(last_frame[b])
                resets.append(False)
                valid_idx.append(None)
        t0 = time.perf_counter()
        out = ev.step_batch(frames, resets, blocking=False)
        jax.block_until_ready(out)
        if t > 0:
            t_total += time.perf_counter() - t0
            n_timed += sum(i is not None for i in valid_idx)
        out = jax.device_get(out)
        for b, idx in enumerate(valid_idx):
            if idx is not None:
                preds_by_idx[idx] = {k: v[b] for k, v in out.items()}

    assert len(preds_by_idx) == n, (len(preds_by_idx), n)
    preds = [preds_by_idx[i] for i in range(n)]
    gts = [gts_by_idx[i] for i in range(n)] if gts_by_idx else []
    fps = n_timed / t_total if t_total > 0 else 0.0
    return preds, gts, fps
