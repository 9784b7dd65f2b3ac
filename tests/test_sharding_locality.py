"""Data-parallel training must stay sharding-local.

The decoder's patch gathers fold (batch, view) into one flat slab index;
under GSPMD that form hides batch-locality from XLA, which then ALL-GATHERS
every fused feature map to every chip inside the decoder loop — fwd and bwd,
every accumulation microbatch (measured: 14 all-gathers/step, incl. the full
[B*T*N, H, W, 2C] image maps). `ops.bilinear.resolve_batch_local` switches
blocked-view gathers to `operand_batching_dims` whenever >1 device is
visible; these tests pin (1) numeric equality of the two forms and (2) the
compiled 8-device accumulation train step containing no feature-map-sized
collectives. The reference never faces this: its DDP replicates the model
and keeps batches process-local by construction (`train.py:93,140`).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from racformer_tpu.ops.bilinear import _gather_patch


def test_hlo_audit_helper():
    """The shared all-gather auditor must catch the tuple-form (combined /
    async-start) all-gathers XLA emits on real TPUs — a dtype-only regex
    misses them entirely — and count dtype-true byte sizes."""
    from racformer_tpu.utils.hlo_audit import (
        assert_no_large_allgathers, large_allgathers)

    hlo = "\n".join([
        "  %all-gather.1 = f32[8,4096]{1,0} all-gather(f32[1,4096]{1,0} %p0),"
        " replica_groups={{0,1}}",
        "  %ag.2 = (bf16[64,512]{1,0}, bf16[64,512]{1,0}) all-gather("
        "bf16[8,512]{1,0} %a, bf16[8,512]{1,0} %b), dimensions={0}",
        "  %ag.3 = (bf16[128]{0}, bf16[1024]{0}) all-gather-start("
        "bf16[128]{0} %c), dimensions={0}",
        "  %small = f32[16]{0} all-gather(f32[2]{0} %d)",
        "  %notag = f32[999999]{0} add(f32[999999]{0} %x, f32[999999]{0} %y)",
    ])
    found = large_allgathers(hlo, limit=2048)
    sizes = sorted(s for s, _ in found)
    # 8*4096*4 = 131072; tuple: 2*64*512*2 = 131072; start: (128+1024)*2=2304
    assert sizes == [2304, 131072, 131072], sizes
    assert not large_allgathers(hlo, limit=200_000)
    with pytest.raises(AssertionError, match="feature-map-sized"):
        assert_no_large_allgathers(hlo, limit=2048)


@pytest.mark.slow
def test_slab_partitioned_survives_gspmd_partitioner(rng):
    """`jax_use_shardy_partitioner=False` (the GSPMD debugging/compat path)
    must not abort: the Shardy sharding_rule is ignored there, so the
    wrapper needs a working infer_sharding_from_operands fallback."""
    from racformer_tpu.ops.bilinear import _patch_sample

    mesh = Mesh(np.array(jax.devices()), ("data",))
    args = _flagship_width_inputs(
        np.random.default_rng(3), len(jax.devices()))
    sh = NamedSharding(mesh, P("data"))

    def loss(fused, *rest):
        return jnp.sum(_patch_sample(True, fused, *rest) ** 2)

    prev = jax.config.jax_use_shardy_partitioner
    try:
        jax.config.update("jax_use_shardy_partitioner", False)
        g = jax.jit(jax.grad(loss), in_shardings=(sh,) * 6)(*args)
    finally:
        jax.config.update("jax_use_shardy_partitioner", prev)
    ref = jax.jit(jax.grad(
        lambda f, *r: jnp.sum(_patch_sample(False, f, *r) ** 2)))(*args)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(ref))


@pytest.mark.slow
def test_slab_partitioned_warns_when_replicated():
    """When the partitioner hands `slab_partitioned` operands with no usable
    dim-0 sharding (here: fully replicated on a >1-device mesh), it must
    fall back to replicated execution LOUDLY — the silent form of this
    downgrade (every chip all-gathers the operands and runs the full
    kernel) is the exact regression this module exists to prevent — and
    the fallback must still compute the right value."""
    from racformer_tpu.ops.bilinear import _patch_sample, _patch_sample_pallas

    rng_ = np.random.default_rng(5)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    args = _flagship_width_inputs(rng_, len(jax.devices()))
    repl = NamedSharding(mesh, P())

    f = jax.jit(lambda *a: _patch_sample_pallas(True, *a),
                in_shardings=(repl,) * 6, out_shardings=repl)
    with pytest.warns(UserWarning, match="REPLICATED"):
        out = f(*args)
    ref = jax.jit(lambda *a: _patch_sample(False, *a))(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_batched_gather_matches_flat(rng):
    S, J, R0, Wp, C2 = 4, 3, 9, 16, 8
    fused = jnp.asarray(rng.normal(size=(S * J, R0, Wp, C2)).astype(np.float32))
    K = 37
    # blocked-views contract: row s only touches slabs [s*J, (s+1)*J)
    view = jnp.asarray(
        (np.arange(S)[:, None] * J + rng.integers(0, J, (S, K))).astype(np.int32))
    y0p = jnp.asarray(rng.integers(0, R0, (S, K)).astype(np.int32))
    x0p = jnp.asarray(rng.integers(0, Wp - 1, (S, K)).astype(np.int32))

    flat = _gather_patch(fused, view, y0p, x0p, batch_local=False)
    batched = _gather_patch(fused, view, y0p, x0p, batch_local=True)
    np.testing.assert_array_equal(np.asarray(flat), np.asarray(batched))

    # cotangent routing (the gather transpose) must agree too
    def s(fn):
        return lambda f: jnp.sum(
            _gather_patch(f, view, y0p, x0p, batch_local=fn) ** 2)

    gf = jax.grad(s(False))(fused)
    gb = jax.grad(s(True))(fused)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gb), atol=1e-6)


def _flagship_width_inputs(rng, S):
    from racformer_tpu.ops.bilinear import aligned_width

    J, R0, C2 = 2, 16, 128
    Wp = aligned_width(24)
    K = 256
    fused = jnp.asarray(rng.normal(size=(S * J, R0, Wp, C2)).astype(np.float32))
    view = jnp.asarray(
        (np.arange(S)[:, None] * J + rng.integers(0, J, (S, K))).astype(np.int32))
    y0p = jnp.asarray(rng.integers(0, R0 - 1, (S, K)).astype(np.int32))
    x0p = jnp.asarray(rng.integers(0, 20, (S, K)).astype(np.int32))
    wx = jnp.asarray(rng.uniform(size=(S, K)).astype(np.float32))
    wy = jnp.asarray(rng.uniform(size=(S, K)).astype(np.float32))
    return fused, view, y0p, x0p, wx, wy


def _assert_no_collectives(hlo):
    for op in ("all-gather", "all-to-all", "all-reduce", "collective-permute"):
        assert not re.search(rf"= (\([^)]*\)|\S+) {op}(?:-start)?\(", hlo), op


@pytest.mark.slow
def test_custom_vjp_path_sharding_local():
    """Flagship-width (2C=128) path: forward batched gather + the
    custom-partitioned Pallas scatter backward must compile to ZERO
    collectives on a data mesh, with gradients bit-identical to the flat
    form (whose compiled step all-gathers the scatter operands)."""
    from racformer_tpu.ops.bilinear import _patch_sample

    rng = np.random.default_rng(0)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    args = _flagship_width_inputs(rng, len(jax.devices()))
    sh = NamedSharding(mesh, P("data"))

    def loss(blocal, fused, view, y0p, x0p, wx, wy):
        return jnp.sum(_patch_sample(blocal, fused, view, y0p, x0p, wx, wy) ** 2)

    grads = {}
    for blocal in (False, True):
        f = jax.jit(lambda *a: jax.grad(loss, argnums=1)(blocal, *a),
                    in_shardings=(sh,) * 6)
        if blocal:
            _assert_no_collectives(f.lower(*args).compile().as_text())
        grads[blocal] = np.asarray(f(*args))
    np.testing.assert_array_equal(grads[False], grads[True])


@pytest.mark.slow
def test_pallas_gather_forward_sharding_local():
    """The Pallas gather forward (default-ON for TPU) is an opaque custom
    call the partitioner would replicate; `gather_patch_rows_sharded` must
    keep it slab-local and match the XLA patch path numerically — and its
    custom-VJP backward must route through the slab-local scatter too
    (`batch_local` threads into `_patch_sample_bwd`, not pinned False)."""
    from racformer_tpu.ops.bilinear import _patch_sample, _patch_sample_pallas

    rng = np.random.default_rng(1)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    args = _flagship_width_inputs(rng, len(jax.devices()))
    sh = NamedSharding(mesh, P("data"))

    f = jax.jit(lambda *a: _patch_sample_pallas(True, *a),
                in_shardings=(sh,) * 6)
    _assert_no_collectives(f.lower(*args).compile().as_text())
    out = np.asarray(f(*args))
    ref = np.asarray(jax.jit(lambda *a: _patch_sample(False, *a))(*args))
    np.testing.assert_allclose(out, ref, atol=1e-5)

    def loss(blocal, fused, *rest):
        return jnp.sum(_patch_sample_pallas(blocal, fused, *rest) ** 2)

    g = jax.jit(lambda *a: jax.grad(loss, argnums=1)(True, *a),
                in_shardings=(sh,) * 6)
    _assert_no_collectives(g.lower(*args).compile().as_text())
    gref = jax.jit(lambda *a: jax.grad(
        lambda f, *r: jnp.sum(_patch_sample(False, f, *r) ** 2))(*a))(*args)
    np.testing.assert_allclose(
        np.asarray(g(*args)), np.asarray(gref), rtol=2e-2, atol=2e-2)


@pytest.mark.slow
def test_sharded_eval_forward_has_no_large_collectives():
    """val.py's offline eval jits the eval-mode forward + box decode over
    Mesh(('data',)) (`val.py:242-270`); the forward's patch gathers must
    resolve batch-local there exactly like the train step's."""
    import __graft_entry__ as ge
    from racformer_tpu.eval.decode import decode_boxes
    from racformer_tpu.model import preprocess_images

    mesh = Mesh(np.array(jax.devices()), ("data",))
    n = len(jax.devices())
    model = ge._flagship_model(train=False, tiny=True)
    batch = ge._example_batch(model, B=n, P=64)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    arg_keys = ("imgs", "radar_points", "radar_mask", "radar_depth",
                "radar_rcs", "lidar2img", "img2lidar", "time_diff")
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), preprocess_images(batch["imgs"]),
        *[batch[k] for k in arg_keys[1:]])

    def predict(b):
        outs = model.apply(
            variables, preprocess_images(b["imgs"]),
            *[b[k] for k in arg_keys[1:]])
        return decode_boxes(outs["all_cls_scores"][-1],
                            outs["all_bbox_preds"][-1], max_num=8)

    shard = NamedSharding(mesh, P("data"))
    jitted = jax.jit(predict, in_shardings=({k: shard for k in arg_keys},),
                     out_shardings=shard)
    from racformer_tpu.utils.hlo_audit import assert_no_large_allgathers

    hlo = jitted.lower(batch).compile().as_text()
    assert_no_large_allgathers(hlo, what="sharded eval forward")
    out = jitted(batch)
    assert np.isfinite(np.asarray(out["scores"])).all()


@pytest.mark.slow
def test_accum_train_step_has_no_large_collectives():
    """Compile the flagship-recipe accumulation step (tiny shapes) over the
    8-device data mesh and assert the optimized HLO moves no batch-sized
    tensors between chips: gradient all-reduces are the only expected
    collectives (plus sub-64KiB stragglers from the loss path)."""
    import __graft_entry__ as ge
    from racformer_tpu.model import preprocess_images
    from racformer_tpu.train import TrainState, make_optimizer, make_train_step

    mesh = Mesh(np.array(jax.devices()), ("data",))
    n = len(jax.devices())
    model = ge._flagship_model(train=True, tiny=True)
    batch = ge._example_batch(model, B=2 * n, P=64, with_gt=True)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        preprocess_images(batch["imgs"]), batch["radar_points"],
        batch["radar_mask"], batch["radar_depth"], batch["radar_rcs"],
        batch["lidar2img"], batch["img2lidar"], batch["time_diff"],
        gt_bboxes=batch["gt_bboxes"], gt_labels=batch["gt_labels"],
        gt_mask=batch["gt_mask"])
    params = variables["params"]
    tx, _ = make_optimizer(params, total_steps=100)
    state = TrainState(params, variables.get("batch_stats", {}),
                       tx.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(
        model, tx, depth_cfg=dict(num_bins=model.depth_bins, downsample=16),
        accum_steps=2)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    jitted = jax.jit(lambda s, b, r: step(s, b, r, 2.0),
                     in_shardings=(repl, {k: shard for k in batch}, repl),
                     out_shardings=(repl, repl))
    hlo = jitted.lower(state, batch, jax.random.PRNGKey(0)).compile().as_text()

    from racformer_tpu.utils.hlo_audit import assert_no_large_allgathers

    for op in ("all-to-all", "collective-permute"):
        assert not re.search(
            rf"= (\([^)]*\)|\S+) {op}(?:-start)?\(", hlo), f"unexpected {op}"
    assert_no_large_allgathers(hlo, what="accumulation train step")
