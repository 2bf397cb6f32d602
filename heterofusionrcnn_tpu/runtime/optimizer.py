"""Optimizer factory (parity with hf/builders/optimizer_builder.py).

Adam / momentum / SGD / RMSProp with exponential-decay LR (staircase), LR
linearly scaled by the data-parallel world size (optimizer_builder.py:105),
global grad-norm clipping 1.0 applied by the trainer (reference
trainer.py:80 slim create_train_op clip_gradient_norm)."""

from __future__ import annotations

import optax

from heterofusionrcnn_tpu.configs.config import OptimizerConfig


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
    return optax.chain(*chain)
