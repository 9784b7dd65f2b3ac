"""Jitted training step with GSPMD data parallelism.

The reference's distributed story is DDP data parallelism over 8 GPUs with
NCCL gradient all-reduce (`/root/reference/train.py:93,140`; SURVEY.md §2.1).
Here the equivalent is a `jax.sharding.Mesh` with one `data` axis: the batch
is sharded, parameters are replicated, and a single `jit` compiles the whole
step — XLA inserts the gradient all-reduces over ICI. Loss normalizers
(`reduce_mean`, `racformer_head.py:399-409`) fall out of global sums.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..model.augment import grid_mask, photometric_distortion
from ..model.racformer import RaCFormer, preprocess_images
from .losses import depth_fg_count, depth_loss, detection_loss


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def make_train_step(model: RaCFormer, tx, depth_cfg=None, accum_steps: int = 1,
                    match_stats: bool = False, loss_scale: float = 0.0):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    `match_stats=True` adds the decoder's per-layer Hungarian assignment to
    the metrics under `_matched_q` / `_match_cost` (see
    `losses.detection_loss`) for `MatchStatsHook`; underscore keys are
    per-sample arrays, not scalars, and bypass the loss averaging.

    `accum_steps > 1` splits the per-chip batch into that many microbatches
    and accumulates gradients through a `lax.scan`, trading wall time for
    activation memory: the reference recipe's 2 samples/device
    (`configs/racformer_r50_nuimg_704x256_f8.py:295-308`) OOMs on a 16 GB
    v5e in one pass, but fits as 2 x B=1 microbatches. Semantics note: the
    set/DN/depth losses normalize by the FULL batch's positive/foreground
    counts (computed before the scan and pre-divided by accum_steps), so the
    accumulated loss and gradients match the fused full-batch step exactly —
    the one remaining deviation is BN batch stats updating per microbatch
    (bounded in docs/PARITY.md; `bn_frame0_only` reproduces the reference
    exactly). Under GSPMD the split
    is interleaved (sample i -> microbatch i % accum_steps) so it stays
    sharding-local when the PER-CHIP batch is a multiple of accum_steps
    (measured: the contiguous split all-gathers the full batch to every
    chip — docs/experiments/accum_split_sharding.py).

    `loss_scale > 0` enables the reference's static fp16 loss scaling as a
    parity-debugging option (`configs/..._f8.py:294` `fp16 =
    dict(loss_scale=512.)` + mmcv `Fp16OptimizerHook`): the loss is
    multiplied by the scale before differentiation and the gradients
    divided by it after, so any low-precision underflow in the backward
    matches the reference run being debugged. The default bf16 path needs
    no scaling (8-bit exponent), so this stays off outside parity work.
    """
    depth_cfg = depth_cfg or {}
    loss_scale = float(loss_scale or 0.0)

    def loss_fn(params, batch_stats, batch, rng, depth_weight,
                pos_norm=None, fg_norm=None):
        variables = {"params": params, "batch_stats": batch_stats}
        rngs = {"dn": jax.random.fold_in(rng, 0), "dropout": jax.random.fold_in(rng, 1)}
        # device-side train augmentation (the reference's GPU-side color
        # jitter + GridMask, `models/racformer.py:197-224` / `:108-109`)
        imgs = photometric_distortion(jax.random.fold_in(rng, 2), batch["imgs"])
        imgs = grid_mask(jax.random.fold_in(rng, 3), imgs)
        outs, mutated = model.apply(
            variables,
            preprocess_images(imgs),
            batch["radar_points"],
            batch["radar_mask"],
            batch["radar_depth"],
            batch["radar_rcs"],
            batch["lidar2img"],
            batch["img2lidar"],
            batch["time_diff"],
            gt_bboxes=batch["gt_bboxes"],
            gt_labels=batch["gt_labels"],
            gt_mask=batch["gt_mask"],
            rngs=rngs,
            mutable=["batch_stats"],
        )
        losses = detection_loss(
            outs, batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            num_classes=model.num_classes, with_match=match_stats,
            pos_norm=pos_norm,
        )
        # depth supervision on frame 0 (`models/racformer.py:377-378`);
        # depth_weight is a traced scalar so the curriculum hook
        # (2.0 -> 1.0 at epoch 18) never retraces the step
        if "gt_depth" in batch:
            ld = depth_loss(
                outs["depth_logits"], batch["gt_depth"],
                **{**depth_cfg, "weight": 1.0}, fg_norm=fg_norm,
            ) * depth_weight
            losses["loss_depth"] = ld
            losses["loss_total"] = losses["loss_total"] + ld
        objective = losses["loss_total"]
        if loss_scale > 0:
            objective = objective * loss_scale  # unscaled in grads_and_losses
        return objective, (losses, mutated["batch_stats"])

    def grads_and_losses(params, batch_stats, batch, rng, depth_weight):
        if accum_steps == 1:
            (_, (losses, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch_stats, batch, rng, depth_weight)
            return grads, losses, new_stats

        # NOTE: inside jit B is the GLOBAL batch, so this guard is only a
        # necessary condition — callers must ensure the PER-CHIP batch is a
        # multiple of accum_steps too (train.py clamps to gcd(accum,
        # batch_size_per_chip)), or the interleaved split below degenerates
        # to the cross-chip reshard it exists to avoid.
        B = jax.tree_util.tree_leaves(batch)[0].shape[0]
        if B % accum_steps:
            raise ValueError(
                f"batch {B} (global when jitted over a mesh) is not "
                f"divisible by accum_steps={accum_steps}")
        # Interleaved split (sample i -> microbatch i % accum_steps), NOT
        # contiguous halves: under GSPMD the global batch axis is
        # block-sharded over the data mesh, and a contiguous
        # [accum, B/accum] split puts microbatch 0 entirely on the first
        # half of the chips — XLA then reshards the whole batch (all-to-all
        # of the images) every step. Interleaving keeps every chip's own
        # rows in every microbatch, so the reshape is sharding-local
        # whenever the per-chip batch is a multiple of accum_steps.
        micro = jax.tree_util.tree_map(
            lambda x: jnp.moveaxis(
                x.reshape(x.shape[0] // accum_steps, accum_steps,
                          *x.shape[1:]), 1, 0),
            batch,
        )
        rngs = jax.random.split(rng, accum_steps)

        # full-batch normalizers, pre-divided by accum_steps: each microbatch
        # then contributes loss_terms / (global_norm / A), and the final
        # 1/A mean makes the accumulated set/DN/depth losses EXACTLY the
        # fused full-batch losses (the per-microbatch positive-count
        # normalization was a measured 7.4% divergence at sparse-GT
        # fixtures — docs/PARITY.md)
        pos_norm = jnp.maximum(
            jnp.sum(batch["gt_mask"]).astype(jnp.float32), 1.0) / accum_steps
        fg_norm = None
        if "gt_depth" in batch:
            fg_cfg = {k: v for k, v in depth_cfg.items()
                      if k in ("d_lo", "d_hi", "num_bins", "downsample")}
            fg_norm = jnp.maximum(
                depth_fg_count(batch["gt_depth"], **fg_cfg), 1.0) / accum_steps

        def body(carry, xs):
            stats, gsum, lsum = carry
            mb, r = xs
            (_, (losses, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, stats, mb, r, depth_weight, pos_norm, fg_norm)
            # underscore keys are per-sample diagnostics (e.g. _matched_q
            # [L, Bm, G]) — stacked across microbatches via ys, not summed
            aux = {k: v for k, v in losses.items() if k.startswith("_")}
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
            lsum = {k: lsum[k] + losses[k] for k in lsum}
            return (new_stats, gsum, lsum), aux

        # trace once on microbatch 0 to learn the loss-dict structure
        zeros_g = jax.tree_util.tree_map(jnp.zeros_like, params)
        l0 = jax.eval_shape(
            lambda p, s, b, r, w: loss_fn(p, s, b, r, w)[1][0],
            params, batch_stats,
            jax.tree_util.tree_map(lambda x: x[0], micro), rngs[0],
            depth_weight)
        zeros_l = {k: jnp.zeros(()) for k in l0 if not k.startswith("_")}
        (new_stats, gsum, lsum), aux = jax.lax.scan(
            body, (batch_stats, zeros_g, zeros_l), (micro, rngs))
        inv = 1.0 / accum_steps
        grads = jax.tree_util.tree_map(lambda g: g * inv, gsum)
        losses = {k: v * inv for k, v in lsum.items()}
        # undo the interleave: aux leaf [a, L, Bm, ...] -> [L, B, ...] with
        # sample order restored (microbatch mb, row p was sample p*a + mb)
        for k, v in aux.items():
            losses[k] = jnp.moveaxis(v, 0, 2).reshape(
                v.shape[1], v.shape[2] * accum_steps, *v.shape[3:])
        return grads, losses, new_stats

    def train_step(state: TrainState, batch: Dict, rng, depth_weight=2.0) -> tuple:
        grads, losses, new_stats = grads_and_losses(
            state.params, state.batch_stats, batch, rng, depth_weight)
        if loss_scale > 0:
            grads = jax.tree_util.tree_map(lambda g: g / loss_scale, grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        new_state = TrainState(new_params, new_stats, new_opt, state.step + 1)
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    return train_step


def optax_global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def data_parallel_shardings(mesh: Mesh, state: TrainState, batch_example: Dict):
    """Replicate state, shard every batch leaf on its leading axis."""
    repl = NamedSharding(mesh, P())
    state_sh = jax.tree_util.tree_map(lambda _: repl, state)
    batch_sh = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P("data")), batch_example
    )
    return state_sh, batch_sh
