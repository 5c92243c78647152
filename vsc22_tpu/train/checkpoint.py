"""Checkpoint / resume subsystem (Orbax).

Parity target (reference, for cross-checking — original implementation):
  D1/train/train_v106/descriptor_train.py:166-180,306-313 — per-epoch
  {'state_dict','optimizer','scheduler','epoch'} snapshots plus a last.txt
  pointer for resume; the EMA shadow is swapped in only for the saved
  snapshot.

Here: Orbax checkpoints of the full functional TrainState (params, opt
state, EMA, step) with retention + latest-step resume; `save_ema_snapshot`
writes the EMA weights as a standalone inference checkpoint (the reference's
"apply_shadow before torch.save" behavior).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for TrainState pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, wait: bool = True) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of `state_template` (abstract ok).

        Every restored leaf is re-placed onto its template leaf's sharding —
        orbax does not guarantee this for all leaves (observed: scalar step
        restored single-device while params stayed mesh-replicated, which
        then fails jit's consistent-devices check on the next train step).
        """
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

        def replace(t, r):
            sharding = getattr(t, "sharding", None)
            return jax.device_put(r, sharding) if sharding is not None else r

        return jax.tree.map(replace, state_template, restored)

    def close(self):
        self._mgr.close()


def save_ema_snapshot(path: str, state) -> None:
    """Write the EMA (or plain) params as a flat .npz inference checkpoint."""
    params = state.ema_params if getattr(state, "ema_params", None) is not None else state.params
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {
        "/".join(str(getattr(k, "key", k)) for k in keypath): np.asarray(value)
        for keypath, value in flat
    }
    np.savez(path, **arrays)


def load_params_snapshot(path: str, params_template):
    """Inverse of save_ema_snapshot: fill a params pytree from the npz."""
    data = np.load(path)
    flat = jax.tree_util.tree_flatten_with_path(params_template)
    leaves = []
    for keypath, value in flat[0]:
        key = "/".join(str(getattr(k, "key", k)) for k in keypath)
        arr = data[key]
        if arr.shape != value.shape:
            raise ValueError(f"{key}: checkpoint {arr.shape} != model {value.shape}")
        leaves.append(arr.astype(value.dtype))
    return jax.tree_util.tree_unflatten(flat[1], leaves)


def save_cnn_snapshot(path: str, params, batch_stats) -> None:
    """Flat npz of a BatchNorm CNN's {params, batch_stats} collections."""
    flat = jax.tree_util.tree_flatten_with_path(
        {"params": params, "batch_stats": batch_stats}
    )[0]
    arrays = {
        "/".join(str(getattr(k, "key", k)) for k in keypath): np.asarray(v)
        for keypath, v in flat
    }
    np.savez(path, **arrays)


def load_cnn_snapshot(path: str, variables_template):
    """Inverse of save_cnn_snapshot into a {'params', 'batch_stats'} tree."""
    template = {
        "params": variables_template["params"],
        "batch_stats": variables_template.get("batch_stats", {}),
    }
    return load_params_snapshot(path, template)
