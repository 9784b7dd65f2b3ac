"""Training hooks: depth-loss curriculum, EMA, and match-statistics dump.

`DepthWeightCurriculum` matches `SequentialControlHook`
(`/root/reference/models/hook/sequentialsontrol.py:8-28` +
`configs/..._f8.py:339-344`): at epoch >= start_epoch the depth loss weight
drops from 2.0 to 1.0.

`ema_update` matches `MEGVIIEMAHook` / `ModelEMA`
(`/root/reference/models/hook/ema.py`): decay 0.999 with a warm-up ramp
`decay * (1 - exp(-step / 2000))`.

`MatchStatsHook` is the working equivalent of the reference's `ISSaveHook`
(`/root/reference/models/hook/is_save.py:62-90`): per decoder layer, dump the
epoch's Hungarian match statistics to
`<path>/dec_{i}/rank_{r}/match_epoch{e}.json` and reset. (The reference hook
is dead code — it reads a `pts_bbox_head.match_dict` attribute the head never
sets, so calling it crashes; here the assignment comes out of the jitted step
as `_matched_q`/`_match_cost` metrics, see `losses.detection_loss`.)
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


class DepthWeightCurriculum:
    def __init__(self, start_epoch: int = 18, before: float = 2.0, after: float = 1.0):
        self.start_epoch = start_epoch
        self.before = before
        self.after = after

    def weight(self, epoch: int) -> float:
        return self.after if epoch >= self.start_epoch else self.before


def ema_update(ema_params, params, step, decay: float = 0.999):
    d = decay * (1.0 - jnp.exp(-step / 2000.0))
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p * (1.0 - d), ema_params, params
    )


class MatchStatsHook:
    """Accumulate per-layer Hungarian match diagnostics; dump per epoch.

    Feed it the HOST copies of each step's metrics (after `jax.device_get`)
    plus the step's ground-truth labels/mask; call `after_epoch(e)` at every
    epoch boundary. Output layout mirrors the reference's intent:
    `dec_{layer}/rank_{rank}/match_epoch{e}.json`, one JSON object per epoch
    mapping step -> {"matched_q", "cost", "label"} lists (invalid/padded GT
    slots dropped), reset after each dump like `ISSaveHook.save_is_dict`.
    """

    def __init__(self, path: str, rank: int = 0, sample_every: int = 1):
        self.path = path
        self.rank = rank
        # memory bound: each recorded step keeps ~L*B*G*(4+4)+B*G*5 bytes of
        # compact numpy (roughly 50 KB at flagship scale), so a full 1,758-step
        # epoch is ~90 MB of host RSS; raise sample_every to subsample long
        # epochs
        self.sample_every = max(1, int(sample_every))
        self._steps = {}  # step -> (matched_q [L,B,G], cost [L,B,G], labels [B,G], mask [B,G])

    def record(self, step: int, metrics, gt_labels, gt_mask):
        if "_matched_q" not in metrics or int(step) % self.sample_every:
            return
        self._steps[int(step)] = (
            np.asarray(metrics["_matched_q"], dtype=np.int32),
            np.asarray(metrics["_match_cost"], dtype=np.float32),
            np.asarray(gt_labels),
            np.asarray(gt_mask).astype(bool),
        )

    def after_epoch(self, epoch: int):
        if not self._steps:
            return
        num_layers = next(iter(self._steps.values()))[0].shape[0]
        for layer in range(num_layers):
            out = {}
            for step, (mq, cost, labels, mask) in sorted(self._steps.items()):
                per_sample = []
                for b in range(mq.shape[1]):
                    m = mask[b]
                    per_sample.append({
                        "matched_q": mq[layer, b][m].tolist(),
                        "cost": [round(float(c), 4) for c in cost[layer, b][m]],
                        "label": labels[b][m].tolist(),
                    })
                out[str(step)] = per_sample
            d = os.path.join(self.path, f"dec_{layer}", f"rank_{self.rank}")
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"match_epoch{epoch}.json"), "w") as f:
                json.dump(out, f)
        self._steps.clear()
