"""Optimizer and LR schedule matching the reference recipe
(`/root/reference/configs/racformer_r50_nuimg_704x256_f8.py:282-308`):
AdamW lr 4e-4, weight decay 0.01, grad-clip 35 (L2), cosine annealing to
1e-3 * lr with 500-iter linear warmup from lr/3; paramwise lr multipliers of
0.1 for `img_backbone` and every `sampling_offset`; backbone stem + stage 1
frozen (`frozen_stages=1`).

bf16 note: the reference trains fp16 with a 512 loss scale
(`Fp16OptimizerHook`); on TPU we train bf16-compute/f32-params, which needs no
loss scaling — a deliberate, documented substitution (SURVEY.md §7 step 9).
"""

from __future__ import annotations

from typing import Any

import jax
import optax


def cosine_warmup_schedule(base_lr=4e-4, total_steps=100_000, warmup_steps=500,
                           warmup_ratio=1.0 / 3.0, min_lr_ratio=1e-3):
    warmup = optax.linear_schedule(
        init_value=base_lr * warmup_ratio, end_value=base_lr,
        transition_steps=warmup_steps,
    )
    cosine = optax.cosine_decay_schedule(
        init_value=base_lr, decay_steps=max(total_steps - warmup_steps, 1),
        alpha=min_lr_ratio,
    )
    return optax.join_schedules([warmup, cosine], [warmup_steps])


def _param_label(path) -> str:
    keys = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(str(k) for k in keys)
    if "img_backbone" in joined:
        # frozen_stages=1: stem + layer1 get zero lr
        if any(k.startswith(("conv1", "bn1", "layer1_")) for k in map(str, keys)):
            return "frozen"
        return "backbone"
    if "sampling_offset" in joined:
        return "offset"
    return "normal"


def make_optimizer(params, base_lr=4e-4, weight_decay=0.01, total_steps=100_000,
                   warmup_steps=500, clip_norm=35.0):
    sched = cosine_warmup_schedule(base_lr, total_steps, warmup_steps)
    sched01 = cosine_warmup_schedule(base_lr * 0.1, total_steps, warmup_steps)

    def adamw(s):
        return optax.adamw(s, weight_decay=weight_decay)

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: _param_label(path), params
    )
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.multi_transform(
            {
                "normal": adamw(sched),
                "backbone": adamw(sched01),
                "offset": adamw(sched01),
                "frozen": optax.set_to_zero(),
            },
            labels,
        ),
    )
    return tx, sched
