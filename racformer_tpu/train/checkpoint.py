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

    def save(self, step: int, state: Any) -> None:
        for attempt in range(self.retries):
            if attempt > 0:
                # orbax refuses to save over an existing step; a retry must
                # delete the corrupted checkpoint first
                try:
                    self.mgr.delete(step)
                except Exception:
                    pass
            self.mgr.save(step, args=ocp.args.StandardSave(state))
            self.mgr.wait_until_finished()
            if not self.verify:
                return
            try:
                restored = self.mgr.restore(step, args=ocp.args.StandardRestore(state))
                # the reference re-loads the whole checkpoint and retries up
                # to 10x (`check_checkpoint.py:141-157`); compare a hash over
                # every leaf so any corrupted tensor fails verification
                if _tree_digest(state) == _tree_digest(restored):
                    return
            except Exception:
                pass
            if attempt == self.retries - 1:
                raise RuntimeError(f"checkpoint save verification failed @ step {step}")

    def restore_latest(self, state_template: Any) -> Optional[tuple]:
        step = self.mgr.latest_step()
        if step is None:
            return None
        restored = self.mgr.restore(step, args=ocp.args.StandardRestore(state_template))
        return step, restored

    def restore_latest_eval(self, params_template, batch_stats_template):
        """Restore only (params, batch_stats) from a training checkpoint —
        eval has no optimizer state, and a full-template StandardRestore
        refuses a tree whose `opt_state` leaf is None."""
        step = self.mgr.latest_step()
        if step is None:
            return None
        item = {"params": params_template, "batch_stats": batch_stats_template}
        restored = self.mgr.restore(
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
