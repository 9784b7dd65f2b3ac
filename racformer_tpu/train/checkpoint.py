"""Checkpointing: orbax saves with load-back verification and retry.

Capability match for the reference's checkpoint surface (SURVEY.md §5):
per-epoch saves with `max_keep`, resume of full runner state, pretrained-load
with `revise_keys` remapping (`/root/reference/train.py:174-188`), and the
verify-and-retry behavior of `Check_CheckpointHook`
(`/root/reference/models/hook/check_checkpoint.py:141-202`).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _tree_digest(tree: Any) -> str:
    """SHA-256 over every leaf's bytes (host-fetched once), in tree order."""
    import hashlib

    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(tree):
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    return h.hexdigest()


class CheckpointManager:
    def __init__(self, work_dir: str, max_keep: int = 4, verify: bool = True,
                 retries: int = 3):
        self.dir = os.path.abspath(os.path.join(work_dir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_keep),
        )
        self.verify = verify
        self.retries = retries

    def save(self, step: int, state: Any, ema: Any = None) -> None:
        """Save `state` (optionally bundled with EMA params) verified.

        EMA rides inside the same managed checkpoint as `{"state", "ema"}`
        so it is verified, rotated by `max_keep`, and resumable — the
        orbax-native equivalent of `MEGVIIEMAHook`'s per-epoch EMA saves
        (`/root/reference/models/hook/ema.py:100-118`), replacing the old
        side-channel `ema_params.pkl`.
        """
        item = state if ema is None else {"state": state, "ema": ema}
        for attempt in range(self.retries):
            if attempt > 0:
                # orbax refuses to save over an existing step; a retry must
                # delete the corrupted checkpoint first
                try:
                    self.mgr.delete(step)
                except Exception:
                    pass
            self.mgr.save(step, args=ocp.args.StandardSave(item))
            self.mgr.wait_until_finished()
            if not self.verify:
                return
            try:
                restored = self.mgr.restore(step, args=ocp.args.StandardRestore(item))
                # the reference re-loads the whole checkpoint and retries up
                # to 10x (`check_checkpoint.py:141-157`); compare a hash over
                # every leaf so any corrupted tensor fails verification
                if _tree_digest(item) == _tree_digest(restored):
                    return
            except Exception:
                pass
            if attempt == self.retries - 1:
                raise RuntimeError(f"checkpoint save verification failed @ step {step}")

    def restore_latest(self, state_template: Any, ema_template: Any = None
                       ) -> Optional[tuple]:
        """Returns (step, state) — or (step, state, ema) when `ema_template`
        is given. Either template shape restores from either checkpoint
        layout (plain state vs {"state", "ema"} bundle), so a run can be
        resumed with or without `--ema` regardless of how it was saved."""
        step = self.mgr.latest_step()
        if step is None:
            return None
        bundled = self._is_bundled(step)
        if ema_template is not None:
            if bundled:
                restored = self.mgr.restore(step, args=ocp.args.StandardRestore(
                    {"state": state_template, "ema": ema_template}))
                return step, restored["state"], restored["ema"]
            # saved without EMA: seed EMA from the restored params
            state = self.mgr.restore(
                step, args=ocp.args.StandardRestore(state_template))
            return step, state, None
        if bundled:
            restored = self._read_mgr().restore(step, args=ocp.args.PyTreeRestore(
                item={"state": state_template}, partial_restore=True))
            return step, restored["state"]
        restored = self.mgr.restore(step, args=ocp.args.StandardRestore(state_template))
        return step, restored

    def _read_mgr(self):
        """Fresh manager for PyTreeRestore reads: a manager that has done a
        StandardSave has its handler registry bound to the Standard handler
        and rejects PyTree restore args on the same item."""
        return ocp.CheckpointManager(self.dir)

    def _is_bundled(self, step: int) -> bool:
        """True if checkpoint `step` was saved as a {"state", "ema"} bundle.

        Reads the saved `_METADATA` tree directly: a fresh manager (the
        resume process) cannot reconstruct item metadata without a handler
        registry, so `item_metadata` is only usable in the saving process."""
        import json

        meta_path = os.path.join(self.dir, str(step), "default", "_METADATA")
        try:
            with open(meta_path) as f:
                tm = json.load(f)["tree_metadata"]
            roots = set()
            for k in tm:
                k = k.strip()
                # keys are stringified tuples "('state', 'params', ...)" or
                # (older layouts) "state.params..." / "state/params/..."
                root = (k.split("'")[1] if k.startswith("(")
                        else k.split("/")[0].split(".")[0])
                roots.add(root)
            return roots == {"state", "ema"}
        except Exception:
            try:
                meta = self.mgr.item_metadata(step)
                tree = getattr(meta, "tree", None) or getattr(meta, "item", meta)
                return (hasattr(tree, "keys")
                        and set(tree.keys()) == {"state", "ema"})
            except Exception:
                return False

    def restore_latest_eval(self, params_template, batch_stats_template,
                            use_ema: bool = False):
        """Restore only (params, batch_stats) from a training checkpoint —
        eval has no optimizer state, and a full-template StandardRestore
        refuses a tree whose `opt_state` leaf is None. With `use_ema=True`
        the EMA params are returned instead (the reference evaluates its
        EMA checkpoints directly, `models/hook/ema.py:100-118`)."""
        step = self.mgr.latest_step()
        if step is None:
            return None
        item = {"params": params_template, "batch_stats": batch_stats_template}
        if self._is_bundled(step):
            want = {"state": item}
            if use_ema:
                want = {"state": {"batch_stats": batch_stats_template},
                        "ema": params_template}
            restored = self._read_mgr().restore(
                step, args=ocp.args.PyTreeRestore(item=want, partial_restore=True))
            if use_ema:
                return step, restored["ema"], restored["state"]["batch_stats"]
            return (step, restored["state"]["params"],
                    restored["state"]["batch_stats"])
        if use_ema:
            raise ValueError("checkpoint has no EMA params (saved without --ema)")
        restored = self._read_mgr().restore(
            step, args=ocp.args.PyTreeRestore(item=item, partial_restore=True))
        return step, restored["params"], restored["batch_stats"]


def apply_revise_keys(flat_params: dict, revise_keys) -> dict:
    """Remap pretrained parameter path prefixes, e.g. ('backbone',
    'img_backbone') (`train.py:178-188`). Operates on '/'-joined path keys."""
    out = {}
    for k, v in flat_params.items():
        for old, new in revise_keys or []:
            if k.startswith(old):
                k = new + k[len(old):]
                break
        out[k] = v
    return out
