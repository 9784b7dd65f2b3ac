"""Training hooks: depth-loss curriculum and EMA.

`DepthWeightCurriculum` matches `SequentialControlHook`
(`/root/reference/models/hook/sequentialsontrol.py:8-28` +
`configs/..._f8.py:339-344`): at epoch >= start_epoch the depth loss weight
drops from 2.0 to 1.0.

`ema_update` matches `MEGVIIEMAHook` / `ModelEMA`
(`/root/reference/models/hook/ema.py`): decay 0.999 with a warm-up ramp
`decay * (1 - exp(-step / 2000))`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
