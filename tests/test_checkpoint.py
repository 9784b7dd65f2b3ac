"""Checkpoint save/verify/restore roundtrip + revise_keys."""

import jax
import jax.numpy as jnp
import numpy as np

from racformer_tpu.train import TrainState
from racformer_tpu.train.checkpoint import CheckpointManager, apply_revise_keys


def test_save_restore_roundtrip(tmp_path, rng):
    params = {"dense": {"kernel": jnp.asarray(rng.normal(size=(4, 8)), jnp.float32),
                        "bias": jnp.zeros((8,))}}
    state = TrainState(params, {}, {"count": jnp.zeros(())},
                       jnp.asarray(7, jnp.int32))
    mgr = CheckpointManager(str(tmp_path), max_keep=2, verify=True)
    mgr.save(1, state)
    mgr.save(2, state._replace(step=jnp.asarray(8, jnp.int32)))

    restored = mgr.restore_latest(state)
    assert restored is not None
    step, st = restored
    assert step == 2
    assert int(st.step) == 8
    np.testing.assert_allclose(st.params["dense"]["kernel"],
                               params["dense"]["kernel"], atol=1e-7)


def test_max_keep(tmp_path, rng):
    params = {"w": jnp.ones((2, 2))}
    state = TrainState(params, {}, {}, jnp.zeros((), jnp.int32))
    mgr = CheckpointManager(str(tmp_path), max_keep=2, verify=False)
    for s in range(1, 5):
        mgr.save(s, state)
    mgr.mgr.wait_until_finished()
    assert sorted(mgr.mgr.all_steps()) == [3, 4]


def test_revise_keys_on_tree_paths():
    flat = {"backbone/conv1/kernel": 1, "neck/fpn0/kernel": 2}
    out = apply_revise_keys(flat, [("backbone", "img_backbone")])
    assert "img_backbone/conv1/kernel" in out
    assert "neck/fpn0/kernel" in out


def test_save_verify_retry_resaves(tmp_path, monkeypatch):
    """A failed verification must be able to RE-save the same step: orbax
    raises ValueError on saving an existing step, so the retry path deletes
    the corrupted checkpoint first."""
    import racformer_tpu.train.checkpoint as ckpt

    cm = CheckpointManager(str(tmp_path), verify=True, retries=3)
    state = {"w": np.arange(8.0, dtype=np.float32)}
    calls = {"n": 0}
    real = ckpt._tree_digest

    def flaky(tree):
        calls["n"] += 1
        if calls["n"] <= 2:  # first attempt's (state, restored) pair differs
            return f"bad-{calls['n']}"
        return real(tree)

    monkeypatch.setattr(ckpt, "_tree_digest", flaky)
    cm.save(3, state)  # must not raise 'checkpoint already exists'
    assert calls["n"] >= 4
    step, restored = cm.restore_latest(state)
    assert step == 3
    np.testing.assert_array_equal(restored["w"], state["w"])


def test_ema_bundle_save_resume_and_eval(tmp_path):
    """EMA params ride the managed checkpoint (verified/rotated/resumable),
    replacing the side-channel pickle — `models/hook/ema.py:100-118`
    equivalent. Resume must restore EMA state; eval can select EMA weights."""
    params = {"w": jnp.ones((3,))}
    stats = {"bn": {"mean": jnp.zeros((2,))}}
    state = TrainState(params, stats, {"count": jnp.zeros(())},
                       jnp.asarray(5, jnp.int32))
    ema = {"w": jnp.full((3,), 0.5)}
    mgr = CheckpointManager(str(tmp_path), verify=True)
    mgr.save(1, state, ema=ema)

    # resume WITH --ema: both trees come back
    step, st, e = mgr.restore_latest(state, ema_template=params)
    assert step == 1 and int(st.step) == 5
    np.testing.assert_allclose(np.asarray(e["w"]), 0.5)

    # resume WITHOUT --ema from a bundled checkpoint still works
    step, st2 = mgr.restore_latest(state)
    np.testing.assert_allclose(np.asarray(st2.params["w"]), 1.0)

    # eval restore: raw params vs EMA params
    _, p, bs = mgr.restore_latest_eval(params, stats)
    np.testing.assert_allclose(np.asarray(p["w"]), 1.0)
    _, pe, bse = mgr.restore_latest_eval(params, stats, use_ema=True)
    np.testing.assert_allclose(np.asarray(pe["w"]), 0.5)
    np.testing.assert_allclose(np.asarray(bse["bn"]["mean"]), 0.0)


def test_resume_with_ema_from_plain_checkpoint(tmp_path):
    """A run saved without --ema can be resumed with --ema: EMA comes back
    None and train.py seeds it from the restored params."""
    params = {"w": jnp.ones((3,))}
    state = TrainState(params, {}, {}, jnp.zeros((), jnp.int32))
    mgr = CheckpointManager(str(tmp_path), verify=True)
    mgr.save(2, state)
    step, st, e = mgr.restore_latest(state, ema_template=params)
    assert step == 2 and e is None
    import pytest

    with pytest.raises(ValueError):
        mgr.restore_latest_eval(params, {}, use_ema=True)
