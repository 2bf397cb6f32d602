"""Train state + jitted train/eval steps for both stages.

Replaces the reference's session/train_op machinery (hf/core/trainer.py):
one pure `train_step(state, batch, rng)` compiled once by jit, data-parallel
over a mesh purely through sharding annotations.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import flax
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    """Parameters + BN stats + optimizer state + step counter."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )


def make_rpn_train_step(loss_fn):
    """Build the jitted RPN train step.

    Args:
      loss_fn: (predictions, config) -> (loss_dict, total); closed over config.
    Returns:
      train_step(state, batch, rng) -> (new_state, metrics dict).
    """

    @jax.jit
    def train_step(state: TrainState, batch, rng):
        drop_rng, path_rng, next_rng = jax.random.split(rng, 3)

        def compute_loss(params):
            preds, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["point_cloud"],
                batch["image_input"],
                batch["stereo_calib_p2"],
                batch["label_seg"],
                batch["label_reg"],
                batch.get("label_boxes_3d"),
                rngs={"dropout": drop_rng, "path_drop": path_rng},
                mutable=["batch_stats"],
            )
            loss_dict, total = loss_fn(preds)
            return total, (loss_dict, updates["batch_stats"], preds)

        (total, (loss_dict, new_stats, preds)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)

        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics = dict(loss_dict)
        metrics["total_loss"] = total
        metrics["seg_accuracy"] = preds.get("seg_accuracy", jnp.zeros(()))
        return new_state, metrics, next_rng

    return train_step
