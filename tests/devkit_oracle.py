"""Independent transliteration of the nuScenes devkit detection algorithm
(nuscenes-devkit `detection/algo.py` accumulate/calc_ap/calc_tp and
`evaluate.py`'s per-class TP selection), used as an ORACLE for
`racformer_tpu/eval/metrics.py`.

Written directly from the devkit's published algorithm over a flat box-list
data model (one box dict per entry, like the devkit's EvalBox), deliberately
NOT sharing code or structure with the vectorized production implementation
so that agreement between the two is meaningful.

Box dict: {sample: int, x, y, w, l, h, yaw, vx, vy, score (preds only),
attr: int (-1/0 = no attribute)}.
"""

from __future__ import annotations

import numpy as np

MIN_RECALL = 0.1
MIN_PRECISION = 0.1
DIST_THS = (0.5, 1.0, 2.0, 4.0)
TP_METRICS = ("trans_err", "scale_err", "orient_err", "vel_err", "attr_err")


def center_distance(a, b):
    return float(np.hypot(a["x"] - b["x"], a["y"] - b["y"]))


def scale_iou(a, b):
    mins = [min(a[k], b[k]) for k in ("w", "l", "h")]
    inter = mins[0] * mins[1] * mins[2]
    vol_a = a["w"] * a["l"] * a["h"]
    vol_b = b["w"] * b["l"] * b["h"]
    return inter / (vol_a + vol_b - inter)


def yaw_diff(a, b, period):
    d = (a["yaw"] - b["yaw"]) % period
    return float(min(d, period - d))


def velocity_l2(a, b):
    return float(np.hypot(a["vx"] - b["vx"], a["vy"] - b["vy"]))


def attr_acc(gt, pred):
    """1 - accuracy; NaN when the GT has no attribute (devkit attr_acc)."""
    if gt["attr"] <= 0:
        return np.nan
    return float(pred["attr"] != gt["attr"])


def cummean(x):
    x = np.asarray(x, np.float64)
    if np.all(np.isnan(x)):
        return np.ones(len(x))
    sum_vals = np.nancumsum(x)
    count_vals = np.cumsum(~np.isnan(x))
    return np.divide(sum_vals, count_vals, out=np.zeros_like(sum_vals),
                     where=count_vals > 0)


def accumulate(gt_boxes, pred_boxes, dist_th, period):
    """devkit algo.accumulate for one (class, threshold)."""
    npos = len(gt_boxes)
    if npos == 0:
        return None
    preds = sorted(pred_boxes, key=lambda b: -b["score"])
    taken = set()
    tp, fp, conf = [], [], []
    match_data = {k: [] for k in TP_METRICS}
    match_data["conf"] = []
    for pred in preds:
        min_dist = np.inf
        match_gt_idx = None
        for gt_idx, gt in enumerate(gt_boxes):
            if gt["sample"] == pred["sample"] and gt_idx not in taken:
                d = center_distance(gt, pred)
                if d < min_dist:
                    min_dist = d
                    match_gt_idx = gt_idx
        is_match = min_dist < dist_th
        if is_match:
            taken.add(match_gt_idx)
            tp.append(1)
            fp.append(0)
            conf.append(pred["score"])
            gt = gt_boxes[match_gt_idx]
            match_data["trans_err"].append(center_distance(gt, pred))
            match_data["scale_err"].append(1.0 - scale_iou(gt, pred))
            match_data["orient_err"].append(yaw_diff(gt, pred, period))
            match_data["vel_err"].append(velocity_l2(gt, pred))
            match_data["attr_err"].append(attr_acc(gt, pred))
            match_data["conf"].append(pred["score"])
        else:
            tp.append(0)
            fp.append(1)
            conf.append(pred["score"])

    if len(match_data["trans_err"]) == 0:
        return dict(precision=np.zeros(101), confidence=np.zeros(101),
                    **{k: np.ones(101) for k in TP_METRICS})

    tp = np.cumsum(tp).astype(np.float64)
    fp = np.cumsum(fp).astype(np.float64)
    conf = np.array(conf)
    prec = tp / (fp + tp)
    rec = tp / float(npos)
    rec_interp = np.linspace(0, 1, 101)
    prec = np.interp(rec_interp, rec, prec, right=0)
    conf_i = np.interp(rec_interp, rec, conf, right=0)

    out = dict(precision=prec, confidence=conf_i)
    for key in TP_METRICS:
        tmp = cummean(np.array(match_data[key]))
        out[key] = np.interp(conf_i[::-1],
                             np.array(match_data["conf"])[::-1],
                             tmp[::-1])[::-1]
    return out


def calc_ap(md):
    prec = np.copy(md["precision"])
    prec = prec[round(100 * MIN_RECALL) + 1:]
    prec -= MIN_PRECISION
    prec[prec < 0] = 0
    return float(np.mean(prec)) / (1.0 - MIN_PRECISION)


def calc_tp(md, metric_name):
    first_ind = round(100 * MIN_RECALL) + 1
    nz = np.nonzero(md["confidence"])[0]
    last_ind = int(nz[-1]) if len(nz) else 0
    if last_ind < first_ind:
        return 1.0
    return float(np.mean(md[metric_name][first_ind: last_ind + 1]))


def evaluate(gt_boxes_by_class, pred_boxes_by_class, class_names):
    """devkit evaluate.py aggregation: per-(class, th) AP; TP metrics at the
    2 m threshold with the per-class exclusion table; weighted ND score."""
    aps = {}
    tps = {m: {} for m in TP_METRICS}
    for name in class_names:
        gt = gt_boxes_by_class.get(name, [])
        pred = pred_boxes_by_class.get(name, [])
        period = np.pi if name == "barrier" else 2 * np.pi
        for th in DIST_THS:
            md = accumulate(gt, pred, th, period)
            if md is None:
                continue
            aps[(name, th)] = calc_ap(md)
            if th == 2.0:
                for metric in TP_METRICS:
                    if name == "traffic_cone" and metric in (
                            "attr_err", "vel_err", "orient_err"):
                        continue
                    if name == "barrier" and metric in ("attr_err", "vel_err"):
                        continue
                    tps[metric][name] = calc_tp(md, metric)

    mean_ap = float(np.mean(list(aps.values()))) if aps else 0.0
    out = {"mAP": mean_ap}
    key_map = dict(trans_err="mATE", scale_err="mASE", orient_err="mAOE",
                   vel_err="mAVE", attr_err="mAAE")
    tp_sum = 0.0
    for metric in TP_METRICS:
        vals = list(tps[metric].values())
        v = float(np.mean(vals)) if vals else 1.0
        out[key_map[metric]] = v
        tp_sum += max(0.0, 1.0 - min(1.0, v))
    out["NDS"] = float((5.0 * mean_ap + tp_sum) / 10.0)
    return out


def points_in_box_oracle(box, px, py, pz):
    """Devkit `points_in_box` for one point: local-frame extent test of the
    yaw-rotated 3D box. box: dict(x, y, z, w, l, h, yaw)."""
    dx, dy, dz = px - box["x"], py - box["y"], pz - box["z"]
    c, s = np.cos(-box["yaw"]), np.sin(-box["yaw"])
    lx = c * dx - s * dy
    ly = s * dx + c * dy
    return (abs(lx) <= box["l"] / 2 and abs(ly) <= box["w"] / 2
            and abs(dz) <= box["h"] / 2)


def filter_bikeracks(boxes_by_class, racks_by_sample, z_of):
    """Devkit `filter_eval_boxes` bike-rack step, transliterated: drop
    bicycle/motorcycle boxes whose (gravity) center lies inside any
    `static_object.bicycle_rack` annotation box of the same sample. Applied
    to BOTH GT and prediction box lists. `z_of(box)` supplies the gravity-
    center z (the flat box model here is 2D-centered)."""
    out = {}
    for name, boxes in boxes_by_class.items():
        if name not in ("bicycle", "motorcycle"):
            out[name] = list(boxes)
            continue
        kept = []
        for b in boxes:
            in_rack = False
            for rack in racks_by_sample.get(b["sample"], []):
                if points_in_box_oracle(rack, b["x"], b["y"], z_of(b)):
                    in_rack = True
            if not in_rack:
                kept.append(b)
        out[name] = kept
    return out
