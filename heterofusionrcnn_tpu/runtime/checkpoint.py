"""Checkpointing (parity with the reference's tf.train.Saver usage,
hf/core/trainer.py:87,131-176 and trainer_utils.py).

orbax-backed: per-step directories, max_to_keep retention, restore-latest for
resume, and `restore_matching` for the RPN->RCNN warm start (the analog of
slim's assign_from_checkpoint_fn(ignore_missing_vars=True)).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper with the reference's retention semantics."""

    def __init__(self, directory: str, max_to_keep: int = 1000):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any) -> None:
        """Save params/batch_stats/opt_state/step (PyTree leaves only)."""
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def restore(self, state: Any, step: Optional[int] = None) -> Any:
        """Restore into an existing state template (shapes must match)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return state
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def restore_raw(self, step: Optional[int] = None):
        """Restore a checkpoint as a raw pytree (no template) — used by the
        CLIs to load weights for eval/warm start without building a state."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self._mgr.restore(step)

    def close(self):
        self._mgr.close()


def restore_matching(target_params: Any, source_params: Any) -> Any:
    """Copy identically-named, identically-shaped leaves from source into
    target, keeping target values elsewhere — the RPN->RCNN weight-transfer
    semantics of trainer_utils.load_model_weights (ignore_missing_vars)."""
    t_leaves, t_def = jax.tree_util.tree_flatten_with_path(target_params)
    s_leaves, _ = jax.tree_util.tree_flatten_with_path(source_params)
    source_map = {jax.tree_util.keystr(k): v for k, v in s_leaves}

    new_leaves = []
    for key, val in t_leaves:
        ks = jax.tree_util.keystr(key)
        src = source_map.get(ks)
        if src is not None and getattr(src, "shape", None) == getattr(
            val, "shape", None
        ):
            new_leaves.append(src)
        else:
            new_leaves.append(val)
    return jax.tree_util.tree_unflatten(t_def, new_leaves)
