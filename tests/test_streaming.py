"""Streaming (frame-cache) eval matches the offline path when fed the same
window, and only pays one frame of trunk compute per step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from racformer_tpu.eval.streaming import StreamingEvaluator
from racformer_tpu.model import preprocess_images
from tests.test_model_forward import make_model, tiny_batch


@pytest.mark.slow
def test_streaming_consistency(rng):
    batch, _ = tiny_batch(rng, T=2)
    model = make_model(train=False)
    variables = model.init(
        jax.random.PRNGKey(0), preprocess_images(jnp.asarray(batch["imgs"])),
        *[jnp.asarray(batch[k]) for k in (
            "radar_points", "radar_mask", "radar_depth", "radar_rcs",
            "lidar2img", "img2lidar", "time_diff")],
    )

    ev = StreamingEvaluator(model, variables)
    # feed frame 1 (oldest) then frame 0; after 2 steps the cache holds the
    # same window as the offline batch (frame 0 newest)
    for t in [1, 0]:
        frame = dict(
            imgs=batch["imgs"][0, t],
            radar_points=batch["radar_points"][0, t],
            radar_mask=batch["radar_mask"][0, t],
            radar_depth=batch["radar_depth"][0, t],
            radar_rcs=batch["radar_rcs"][0, t],
            lidar2img=batch["lidar2img"][0, t],
            img2lidar=batch["img2lidar"][0, t],
            timestamp=-0.5 * t,
        )
        out = ev.step(frame)

    # offline reference on the identical window
    outs = model.apply(
        variables, preprocess_images(jnp.asarray(batch["imgs"])),
        *[jnp.asarray(batch[k]) for k in (
            "radar_points", "radar_mask", "radar_depth", "radar_rcs",
            "lidar2img", "img2lidar", "time_diff")],
    )
    from racformer_tpu.eval import decode_boxes

    ref = jax.device_get(
        decode_boxes(outs["all_cls_scores"][-1], outs["all_bbox_preds"][-1])
    )
    np.testing.assert_allclose(
        out["scores"][0], ref["scores"][0], rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        out["bboxes"][0], ref["bboxes"][0], rtol=2e-2, atol=2e-2
    )

    # reset clears the temporal cache
    ev.reset()
    assert ev.cache is None


@pytest.mark.slow
def test_scene_boundary_reset_equivalence(rng):
    """Two back-to-back scenes through one evaluator (with reset at the
    boundary, as val.py does on scene_token change) must produce the same
    result as evaluating the second scene in a fresh evaluator — i.e. no
    temporal-cache bleed across scenes (the reference keys its cache by
    filename for the same reason, models/racformer.py:503-556)."""
    batch_a, _ = tiny_batch(rng, T=2)
    batch_b, _ = tiny_batch(np.random.default_rng(123), T=2)
    model = make_model(train=False)
    variables = model.init(
        jax.random.PRNGKey(0),
        preprocess_images(jnp.asarray(batch_a["imgs"])),
        *[jnp.asarray(batch_a[k]) for k in (
            "radar_points", "radar_mask", "radar_depth", "radar_rcs",
            "lidar2img", "img2lidar", "time_diff")],
    )

    def frame(batch, t):
        return dict(
            imgs=batch["imgs"][0, t],
            radar_points=batch["radar_points"][0, t],
            radar_mask=batch["radar_mask"][0, t],
            radar_depth=batch["radar_depth"][0, t],
            radar_rcs=batch["radar_rcs"][0, t],
            lidar2img=batch["lidar2img"][0, t],
            img2lidar=batch["img2lidar"][0, t],
            timestamp=0.5 * (1 - t),
        )

    ev = StreamingEvaluator(model, variables)
    for t in [1, 0]:
        ev.step(frame(batch_a, t))
    ev.reset()  # scene boundary
    for t in [1, 0]:
        out_joint = ev.step(frame(batch_b, t))

    ev2 = StreamingEvaluator(model, variables)
    for t in [1, 0]:
        out_solo = ev2.step(frame(batch_b, t))

    np.testing.assert_allclose(
        np.asarray(out_joint["scores"]), np.asarray(out_solo["scores"]),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_joint["bboxes"]), np.asarray(out_solo["bboxes"]),
        rtol=1e-5, atol=1e-5)


def test_scene_partitioning():
    """Stream assignment: consecutive-run grouping from infos metadata,
    greedy longest-first balancing, contiguous split when no metadata."""
    from racformer_tpu.eval.streaming import _assign_streams, _scene_groups

    class D:
        def __init__(self, toks):
            self.infos = [{"scene_token": t} for t in toks]

        def __len__(self):
            return len(self.infos)

    groups = _scene_groups(D(list("aaabbc")))
    assert groups == [[0, 1, 2], [3, 4], [5]]

    plan = _assign_streams(groups, 2)
    # longest scene (3) alone on one stream; the 2+1 pair on the other
    sizes = sorted(sum(len(g) for g in s) for s in plan)
    assert sizes == [3, 3]
    # every index exactly once
    flat = sorted(i for s in plan for g in s for i in g)
    assert flat == list(range(6))

    # no metadata: one group, split contiguously
    class E:
        def __len__(self):
            return 7

    plan = _assign_streams(_scene_groups(E()), 3)
    flat = sorted(i for s in plan for g in s for i in g)
    assert flat == list(range(7))
    for s in plan:
        for g in s:
            assert g == list(range(g[0], g[0] + len(g)))  # contiguous


@pytest.mark.slow
def test_step_batch_matches_single_stream(rng):
    """Lockstep multi-stream (in-graph per-stream resets) must reproduce the
    single-stream `step()` sequences exactly: stream 0 runs one 3-frame
    scene; stream 1 hits a scene boundary at t=1 (reset mid-batch while
    stream 0 keeps its window)."""
    model = make_model(train=False)
    batches = [tiny_batch(np.random.default_rng(s), T=2)[0] for s in range(4)]
    variables = model.init(
        jax.random.PRNGKey(0),
        preprocess_images(jnp.asarray(batches[0]["imgs"])),
        *[jnp.asarray(batches[0][k]) for k in (
            "radar_points", "radar_mask", "radar_depth", "radar_rcs",
            "lidar2img", "img2lidar", "time_diff")],
    )

    def frame(batch, ts):
        return dict(
            imgs=batch["imgs"][0, 0], radar_points=batch["radar_points"][0, 0],
            radar_mask=batch["radar_mask"][0, 0],
            radar_depth=batch["radar_depth"][0, 0],
            radar_rcs=batch["radar_rcs"][0, 0],
            lidar2img=batch["lidar2img"][0, 0],
            img2lidar=batch["img2lidar"][0, 0], timestamp=ts,
        )

    # stream 0: scene A frames 0..2; stream 1: scene B frame 0, then scene C
    # frames 0..1 (reset at t=1)
    s0 = [frame(batches[0], 0.0), frame(batches[1], 0.5),
          frame(batches[2], 1.0)]
    s1 = [frame(batches[3], 0.0), frame(batches[1], 0.0),
          frame(batches[0], 0.5)]
    resets = [(True, True), (False, True), (False, False)]

    ref = []
    ev = StreamingEvaluator(model, variables)
    for streams, evr in ((s0, [True, False, False]), (s1, [True, True, False])):
        outs = []
        for f, r in zip(streams, evr):
            if r:
                ev.reset()
            outs.append(ev.step(f))
        ref.append(outs)

    evb = StreamingEvaluator(model, variables)
    for t in range(3):
        out = evb.step_batch([s0[t], s1[t]], list(resets[t]))
        for b in range(2):
            np.testing.assert_allclose(
                out["scores"][b], ref[b][t]["scores"][0],
                rtol=1e-4, atol=1e-4, err_msg=f"t={t} stream={b}")
            np.testing.assert_allclose(
                out["bboxes"][b], ref[b][t]["bboxes"][0],
                rtol=1e-3, atol=1e-3, err_msg=f"t={t} stream={b}")


@pytest.mark.slow
def test_run_multistream_dataset(rng):
    """End-to-end runner: scene-annotated dataset through 2 lockstep streams
    matches the sequential single-stream val.py loop, preds ordered by
    dataset index, gts collected, fps > 0."""
    from racformer_tpu.eval.streaming import (
        prepare_frame, radar_maps_are_columns, run_multistream,
        sample_timestamp)

    model = make_model(train=False)
    b0, g0 = tiny_batch(rng, T=2)
    variables = model.init(
        jax.random.PRNGKey(0), preprocess_images(jnp.asarray(b0["imgs"])),
        *[jnp.asarray(b0[k]) for k in (
            "radar_points", "radar_mask", "radar_depth", "radar_rcs",
            "lidar2img", "img2lidar", "time_diff")],
    )

    class SceneDataset:
        """5 samples in 2 scenes (3 + 2); per-sample leading axis is the
        window axis the real datasets carry (streaming reads frame 0)."""

        def __init__(self):
            self.infos = [{"scene_token": t, "timestamp": 1e9 + i * 5e-1}
                          for i, t in enumerate("aaabb")]

        def __len__(self):
            return 5

        def __getitem__(self, i):
            b, g = tiny_batch(np.random.default_rng(100 + i), T=1)
            s = {k: v[0] for k, v in b.items()}
            s.update(scene=self.infos[i]["scene_token"],
                     timestamp=self.infos[i]["timestamp"],
                     gt_bboxes=g["gt_bboxes"][0], gt_labels=g["gt_labels"][0],
                     gt_mask=g["gt_mask"][0])
            return s

    ds = SceneDataset()

    # sequential single-stream reference (the val.py loop)
    ev = StreamingEvaluator(model, variables)
    ref, prev, t0 = [], None, 0.0
    cols = radar_maps_are_columns(ds[0])
    for i in range(len(ds)):
        s = ds[i]
        ts = sample_timestamp(s, i)
        if s["scene"] != prev:
            ev.reset()
            prev, t0 = s["scene"], ts
        out = ev.step(prepare_frame(s, ts - t0, cols))
        ref.append({k: v[0] for k, v in out.items()})

    evb = StreamingEvaluator(model, variables)
    preds, gts, fps = run_multistream(evb, ds, streams=2)
    assert len(preds) == 5 and len(gts) == 5 and fps > 0
    for i in range(5):
        np.testing.assert_allclose(preds[i]["scores"], ref[i]["scores"],
                                   rtol=1e-4, atol=1e-4, err_msg=f"i={i}")
    # gt passthrough is per-index
    np.testing.assert_array_equal(gts[2]["labels"],
                                  np.asarray(ds[2]["gt_labels"]))

    # more streams than scene groups: the runner must clamp (an empty
    # stream has no frame to re-feed — this used to crash on a None frame)
    preds4, gts4, _ = run_multistream(StreamingEvaluator(model, variables),
                                      ds, streams=4)
    assert len(preds4) == 5 and len(gts4) == 5
    for i in range(5):
        np.testing.assert_allclose(preds4[i]["scores"], ref[i]["scores"],
                                   rtol=1e-4, atol=1e-4, err_msg=f"i={i}")


@pytest.mark.slow
def test_multistream_sharded_mesh(rng):
    """8 streams sharded over the 8-virtual-CPU mesh: the batch axis is the
    data axis; the run completes with per-index preds (weak-scaling eval —
    each device owns one stream's window)."""
    from racformer_tpu.eval.streaming import run_multistream

    model = make_model(train=False)
    b0, _ = tiny_batch(rng, T=2)
    variables = model.init(
        jax.random.PRNGKey(0), preprocess_images(jnp.asarray(b0["imgs"])),
        *[jnp.asarray(b0[k]) for k in (
            "radar_points", "radar_mask", "radar_depth", "radar_rcs",
            "lidar2img", "img2lidar", "time_diff")],
    )

    class D:
        def __init__(self):
            self.infos = [{"scene_token": f"s{i // 2}",
                           "timestamp": i * 0.5} for i in range(16)]

        def __len__(self):
            return 16

        def __getitem__(self, i):
            b, _ = tiny_batch(np.random.default_rng(i), T=1)
            s = {k: v[0] for k, v in b.items()}
            s.update(scene=self.infos[i]["scene_token"],
                     timestamp=self.infos[i]["timestamp"])
            return s

    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    ev = StreamingEvaluator(model, variables, mesh=mesh)
    preds, gts, fps = run_multistream(ev, D(), streams=8)
    assert len(preds) == 16 and gts == []
    assert all(np.isfinite(p["scores"]).all() for p in preds)


@pytest.mark.slow
def test_step_batch_dict_form_matches_list(rng):
    """The pre-batched dict input form (device-resident fast path — no
    host-side restack) is bit-identical to the list-of-frames form."""
    model = make_model(train=False)
    b, _ = tiny_batch(rng, T=2)
    variables = model.init(
        jax.random.PRNGKey(0), preprocess_images(jnp.asarray(b["imgs"])),
        *[jnp.asarray(b[k]) for k in (
            "radar_points", "radar_mask", "radar_depth", "radar_rcs",
            "lidar2img", "img2lidar", "time_diff")],
    )

    def frame(t):
        return dict(
            imgs=b["imgs"][0, t], radar_points=b["radar_points"][0, t],
            radar_mask=b["radar_mask"][0, t],
            radar_depth=b["radar_depth"][0, t], radar_rcs=b["radar_rcs"][0, t],
            lidar2img=b["lidar2img"][0, t], img2lidar=b["img2lidar"][0, t],
            timestamp=0.5 * t,
        )

    ev = StreamingEvaluator(model, variables)
    o_list = ev.step_batch([frame(0), frame(1)], [True, True])

    batched = {k: np.stack([np.asarray(frame(0)[k]), np.asarray(frame(1)[k])])
               for k in ("imgs", "radar_points", "radar_mask", "radar_depth",
                         "radar_rcs", "img2lidar", "lidar2img")}
    batched["timestamp"] = np.asarray([0.0, 0.5], np.float32)
    ev2 = StreamingEvaluator(model, variables)
    o_dict = ev2.step_batch(batched, [True, True])
    for k in o_list:
        np.testing.assert_array_equal(np.asarray(o_list[k]),
                                      np.asarray(o_dict[k]), err_msg=k)


@pytest.mark.slow
def test_in_training_streaming_eval_matches_offline(rng):
    """VERDICT r4 item 6: `evaluation.mode="streaming"` must produce the
    same metrics as the offline evaluator when the dataset's sample windows
    equal the scene history (each sample's sweep t is keyframe i-t,
    duplicate-first padding — the real nuScenes window convention)."""
    from racformer_tpu.eval.offline import OfflineEvaluator
    from racformer_tpu.eval.streaming import run_multistream
    from racformer_tpu.eval.metrics import nuscenes_metrics

    model = make_model(train=False)
    T = model.num_frames  # tiny model: 2
    n = 4

    # per-frame data; images integral so the streaming uint8 round-trip is
    # exact vs the offline f32 batch
    frames = []
    for i in range(n):
        b, g = tiny_batch(np.random.default_rng(300 + i), T=1)
        f = {k: v[0, 0] for k, v in b.items() if k != "time_diff"}
        f["imgs"] = np.round(np.clip(f["imgs"], 0, 255))
        f.update(gt_bboxes=g["gt_bboxes"][0], gt_labels=g["gt_labels"][0],
                 gt_mask=g["gt_mask"][0])
        frames.append(f)
    ts = [1e9 + 0.5 * i for i in range(n)]

    class WindowedSceneDataset:
        """One scene; sample i's window t = frame max(i-t, 0) — offline
        windows therefore EQUAL the streaming scene history incl. the
        duplicate-first bootstrap."""

        infos = [{"scene_token": "a", "timestamp": ts[i]} for i in range(n)]

        def __len__(self):
            return n

        def window(self, i):
            return [frames[max(i - t, 0)] for t in range(T)]

        def __getitem__(self, i):
            w = self.window(i)
            s = {k: np.stack([f[k] for f in w])
                 for k in ("imgs", "radar_points", "radar_mask",
                           "radar_depth", "radar_rcs", "lidar2img",
                           "img2lidar")}
            s["time_diff"] = np.asarray(
                [ts[i] - ts[max(i - t, 0)] for t in range(T)], np.float32)
            s.update(scene="a", timestamp=ts[i],
                     gt_bboxes=frames[i]["gt_bboxes"],
                     gt_labels=frames[i]["gt_labels"],
                     gt_mask=frames[i]["gt_mask"])
            return s

        def batch(self, idxs):
            ss = [self[i] for i in idxs]
            return {k: np.stack([s[k] for s in ss]) for k in ss[0]
                    if k not in ("scene", "timestamp")}

    ds = WindowedSceneDataset()
    b0 = ds.batch([0])
    variables = model.init(
        jax.random.PRNGKey(0), preprocess_images(jnp.asarray(b0["imgs"])),
        *[jnp.asarray(b0[k]) for k in (
            "radar_points", "radar_mask", "radar_depth", "radar_rcs",
            "lidar2img", "img2lidar", "time_diff")],
    )

    preds_off, gts_off, _ = OfflineEvaluator(model).run(variables, ds)
    ev = StreamingEvaluator(model, variables)
    preds_st, gts_st, _ = run_multistream(ev, ds, streams=1)

    assert len(preds_off) == len(preds_st) == n
    for i in range(n):
        np.testing.assert_allclose(
            preds_st[i]["scores"], preds_off[i]["scores"], rtol=2e-3,
            atol=2e-3, err_msg=f"i={i}")
        np.testing.assert_allclose(
            preds_st[i]["bboxes"], preds_off[i]["bboxes"], rtol=2e-2,
            atol=2e-2, err_msg=f"i={i}")

    # and the metric protocol agrees end-to-end (the dispatch train.py uses)
    from racformer_tpu.eval.offline import detection_metrics

    m_off = detection_metrics(preds_off, gts_off)
    m_st = detection_metrics(preds_st, gts_st)
    np.testing.assert_allclose(m_st["NDS"], m_off["NDS"], atol=1e-3)
    np.testing.assert_allclose(m_st["mAP"], m_off["mAP"], atol=1e-3)
