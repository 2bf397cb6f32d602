"""Optimizer factory (parity with hf/builders/optimizer_builder.py).

Adam / momentum / SGD / RMSProp with exponential-decay LR (staircase), LR
linearly scaled by the data-parallel world size (optimizer_builder.py:105),
global grad-norm clipping 1.0 applied by the trainer (reference
trainer.py:80 slim create_train_op clip_gradient_norm)."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax

from heterofusionrcnn_tpu.configs.config import OptimizerConfig


class ParamEmaState(NamedTuple):
    """State for `param_ema`: the exponential moving average of params."""

    ema: Any


def param_ema(decay: float) -> optax.GradientTransformation:
    """Track an EMA of the *post-step parameters* inside the optimizer state
    (parity with tf.contrib.opt.MovingAverageOptimizer,
    hf/builders/optimizer_builder.py:74-77: averaged variables are kept
    alongside and swapped in at checkpoint time).

    Chain this LAST so `updates` are the final applied updates; the EMA then
    tracks exactly the parameters the step produces. Retrieve with
    `get_ema_params(opt_state)`.
    """

    def init(params):
        return ParamEmaState(ema=jax.tree_util.tree_map(lambda p: p, params))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("param_ema requires params")
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p, state.ema, new_params
        )
        return updates, ParamEmaState(ema=ema)

    return optax.GradientTransformation(init, update)


def get_ema_params(opt_state):
    """Pull the averaged params out of a chain built with use_moving_average
    (None if the chain has no ParamEmaState)."""
    for s in jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: isinstance(x, ParamEmaState)
    ):
        if isinstance(s, ParamEmaState):
            return s.ema
    return None


def build_lr_schedule(cfg: OptimizerConfig, world_size: int = 1):
    """Exponential decay schedule; initial LR scaled by world size."""
    return optax.exponential_decay(
        init_value=cfg.initial_learning_rate * world_size,
        transition_steps=cfg.decay_steps,
        decay_rate=cfg.decay_factor,
        staircase=cfg.staircase,
    )


def build_optimizer(
    cfg: OptimizerConfig, world_size: int = 1, grad_clip_norm: float = 1.0
) -> optax.GradientTransformation:
    lr = build_lr_schedule(cfg, world_size)
    if cfg.optimizer_type == "adam":
        opt = optax.adam(lr)
    elif cfg.optimizer_type == "momentum":
        opt = optax.sgd(lr, momentum=cfg.momentum)
    elif cfg.optimizer_type == "sgd":
        opt = optax.sgd(lr)
    elif cfg.optimizer_type == "rmsprop":
        opt = optax.rmsprop(lr, momentum=cfg.momentum)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer_type}")

    chain = []
    if grad_clip_norm and grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(opt)
    if cfg.use_moving_average:
        chain.append(param_ema(cfg.moving_average_decay))
    return optax.chain(*chain)
