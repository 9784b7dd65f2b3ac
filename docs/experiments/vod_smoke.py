"""VoD training smoke (VERDICT r4 item 7): fixture-VoD train run with a
decreasing loss curve and KITTI mAP above the untrained baseline.

Builds a LEARNABLE KITTI-format VoD fixture on disk — GT boxes whose radar
points sit ON the boxes (so the radar->BEV branch carries localization
signal) and whose images carry bright rendered rectangles at the projected
box locations (camera signal) — then drives the REAL `train.py` path
(dataset_type=vod -> VoDDataset -> collate -> train loop -> in-training
KITTI eval) at tiny model shapes on CPU, and finally `val.py` twice
(untrained step-1 checkpoint vs trained) to compare mAP3D.

The fixture draws from a FIXED pool of 6 scene layouts (train) and
evaluates on 8 samples drawn from the same pool — this is a capacity /
pipeline smoke (can the loss fall and mAP rise through the full VoD
pipeline?), not a generalization claim.

Usage: python docs/experiments/vod_smoke.py [workdir]
Writes results to <workdir>/VOD_SMOKE.json and prints a summary.
Reference being mirrored: /root/reference/loaders/vod_mono_dataset.py:311-378
(its loading/eval protocol; the reference repo ships no VoD train recipe).
"""
import json
import os
import pickle
import re
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
               + " --xla_force_host_platform_device_count=8"),
)

H, W = 64, 128
P2 = np.array([[50, 0, 64, 0], [0, 50, 32, 0], [0, 0, 1, 0]], float)


def render_scene(rng, n_box):
    """One scene: boxes in the camera frame (KITTI: x right, y down,
    z forward), radar points on the boxes, image with bright rectangles."""
    loc = np.stack([
        rng.uniform(-6, 6, n_box),          # x
        np.full(n_box, 1.5),                # y (ground)
        rng.uniform(6, 25, n_box),          # z
    ], axis=1).astype(np.float32)
    cls = rng.integers(0, 3, n_box)
    dims_by_cls = np.array([[4.0, 1.6, 1.9], [0.7, 1.8, 0.7],
                            [1.8, 1.7, 0.6]], np.float32)  # l, h, w
    dims = dims_by_cls[cls] * rng.uniform(0.9, 1.1, (n_box, 3)).astype(
        np.float32)
    rot = rng.uniform(-0.4, 0.4, n_box).astype(np.float32)

    # radar: 6 points per box, jittered inside the box footprint + clutter
    pts = []
    for b in range(n_box):
        p = np.zeros((6, 7), np.float32)
        p[:, 0] = loc[b, 0] + rng.uniform(-0.4, 0.4, 6) * dims[b, 0]
        p[:, 1] = loc[b, 1] - rng.uniform(0.0, 0.8, 6) * dims[b, 1]
        p[:, 2] = loc[b, 2] + rng.uniform(-0.4, 0.4, 6) * dims[b, 2]
        p[:, 3] = 15.0 + 5.0 * cls[b] + rng.normal(0, 1, 6)  # RCS by class
        pts.append(p)
    clutter = np.zeros((8, 7), np.float32)
    clutter[:, 0] = rng.uniform(-10, 10, 8)
    clutter[:, 1] = rng.uniform(0.5, 2.0, 8)
    clutter[:, 2] = rng.uniform(4, 30, 8)
    clutter[:, 3] = rng.uniform(-5, 5, 8)
    pts.append(clutter)
    radar = np.concatenate(pts)

    # image: bright class-colored rectangle at each projected box
    img = rng.integers(20, 60, (H, W, 3)).astype(np.uint8)
    for b in np.argsort(-loc[:, 2]):  # far to near
        uvw = P2[:3, :3] @ loc[b] + P2[:3, 3]
        u, v = uvw[0] / uvw[2], uvw[1] / uvw[2]
        half_w = 0.5 * dims[b, 0] * 50 / loc[b, 2]
        half_h = 0.5 * dims[b, 1] * 50 / loc[b, 2]
        u0, u1 = int(u - half_w), int(u + half_w) + 1
        v0, v1 = int(v - 2 * half_h), int(v) + 1
        u0, u1 = max(u0, 0), min(u1, W)
        v0, v1 = max(v0, 0), min(v1, H)
        if u1 > u0 and v1 > v0:
            color = np.zeros(3, np.uint8)
            color[cls[b]] = 230
            img[v0:v1, u0:u1] = color
    return loc, dims, rot, cls, radar, img


def build_fixture(root, n_train=48, n_pool=6, seed=0):
    os.makedirs(root, exist_ok=True)
    names = np.array(["Car", "Pedestrian", "Cyclist"])
    pool = [render_scene(np.random.default_rng(seed + 17 * s),
                         int(np.random.default_rng(seed + s).integers(2, 5)))
            for s in range(n_pool)]
    infos = []
    for i in range(n_train):
        loc, dims, rot, cls, radar, img = pool[i % n_pool]
        rp = os.path.join(root, f"r{i}.bin")
        radar.tofile(rp)
        ip = os.path.join(root, f"i{i}.png")
        from PIL import Image
        Image.fromarray(img).save(ip)
        infos.append(dict(
            image=dict(image_idx=i, image_path=ip),
            calib=dict(P2=P2, Tr_velo_to_cam=np.eye(4), R0_rect=np.eye(4)),
            radar_path=rp,
            annos=dict(name=names[cls], location=loc, dimensions=dims,
                       rotation_y=rot),
        ))
    pkl = os.path.join(root, "vod_infos.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(infos, f)
    return pkl


def run(cmd, **kw):
    r = subprocess.run(cmd, cwd=REPO, env=ENV, capture_output=True,
                       text=True, timeout=5400, **kw)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        raise SystemExit(f"FAILED: {' '.join(cmd[:3])}")
    return r


def main():
    wd = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="vod_smoke_")
    os.makedirs(wd, exist_ok=True)
    pkl = build_fixture(os.path.join(wd, "data"))

    tiny = [
        "model.embed_dims=64", "model.num_query=24", "model.num_clusters=2",
        "model.image_hw=(64,128)", "model.depth_bins=16",
        "model.bev_size=(32,32)", "model.max_gt=8", "radar.max_points=64",
        "batch_size_per_chip=1", "depth.num_bins=16",
        f"data.train.ann_file='{pkl}'", f"data.val.ann_file='{pkl}'",
        "optimizer.warmup_steps=20", "optimizer.base_lr=4e-4",
        "total_epochs=40", "evaluation.interval=40",
        "evaluation.max_samples=8", "accumulate_steps=1",
    ]

    # step-1 "untrained" checkpoint for the baseline mAP
    wd0 = os.path.join(wd, "wd0")
    run([sys.executable, "train.py",
         "--config", "racformer_tpu/configs/racformer_vod.py",
         "--max-steps", "1", "--work-dir", wd0, "--override", *tiny])
    r0 = run([sys.executable, "val.py",
              "--config", "racformer_tpu/configs/racformer_vod.py",
              "--max-samples", "8", "--checkpoint", wd0,
              "--override", *tiny])

    # the smoke train run (40 epochs x 48 samples / batch 8 = 240 steps)
    wd1 = os.path.join(wd, "wd1")
    r1 = run([sys.executable, "train.py",
              "--config", "racformer_tpu/configs/racformer_vod.py",
              "--work-dir", wd1, "--override", *tiny])
    r2 = run([sys.executable, "val.py",
              "--config", "racformer_tpu/configs/racformer_vod.py",
              "--max-samples", "8", "--checkpoint", wd1,
              "--override", *tiny])

    losses, in_training_eval = [], []
    with open(os.path.join(wd1, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("phase") == "val":
                in_training_eval.append(rec)
            elif "loss_total" in rec:
                losses.append(rec["loss_total"])

    def grab(txt):
        out = {}
        for k in ("mAP3D_all", "mAP3D_corridor"):
            m = re.search(rf"{k}[^0-9]*([0-9.]+)", txt)
            out[k] = float(m.group(1)) if m else None
        return out

    res = dict(
        losses_first5=losses[:5], losses_last5=losses[-5:],
        n_loss_lines=len(losses), in_training_eval=in_training_eval,
        untrained=grab(r0.stdout), trained=grab(r2.stdout),
    )
    with open(os.path.join(wd, "VOD_SMOKE.json"), "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))
    if losses:
        a = np.mean(losses[: max(1, len(losses) // 5)])
        b = np.mean(losses[-max(1, len(losses) // 5):])
        print(f"loss first-fifth mean {a:.3f} -> last-fifth mean {b:.3f}")
    print("workdir:", wd)


if __name__ == "__main__":
    main()
