"""Loss functions (parity with hf/core/losses.py).

Each loss mirrors the reference's "weighted" TF-OD-API style: elementwise loss
times a scalar/classwise weight, reduced by the caller (the models divide by
foreground counts with zero-guards — keep that at the call site, reference
rpn_model.py:1040-1128).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_smooth_l1(
    prediction: jnp.ndarray, target: jnp.ndarray, weight=1.0
) -> jnp.ndarray:
    """Smooth-L1 (Huber, delta=1) summed over the last axis
    (hf/core/losses.py WeightedSmoothL1Loss :131-170).

    Args:
      prediction, target: (..., D).
    Returns:
      (...,) per-element loss * weight.
    """
    diff = prediction - target
    abs_diff = jnp.abs(diff)
    loss = jnp.where(abs_diff < 1.0, 0.5 * diff * diff, abs_diff - 0.5)
    return jnp.sum(loss, axis=-1) * weight


def weighted_softmax_ce(
    logits: jnp.ndarray, onehot_labels: jnp.ndarray, weight=1.0
) -> jnp.ndarray:
    """Softmax cross-entropy (hf/core/losses.py WeightedSoftmaxLoss :173-199).

    Args:
      logits: (..., K); onehot_labels: (..., K).
    Returns:
      (...,) per-element CE * weight.
    """
    log_p = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(onehot_labels * log_p, axis=-1) * weight


def weighted_focal(
    probs: jnp.ndarray,
    onehot_labels: jnp.ndarray,
    weight=1.0,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Softmax-probability focal loss, exact parity with the reference
    (hf/core/losses.py WeightedFocalLoss :202-221): takes *probabilities*
    (already softmaxed), clips to [1e-7, 1-1e-7], and computes elementwise
    ``alpha * t * (1-p)^gamma * (-t * log p)`` summed over classes — note the
    target appears squared, which matters for smoothed targets.

    Args:
      probs: (..., K) softmax probabilities; onehot_labels: (..., K).
    Returns:
      (...,) per-element focal loss * weight.
    """
    eps = 1e-7
    p = jnp.clip(probs, eps, 1.0 - eps)
    cross_entropy = -onehot_labels * jnp.log(p)
    f_weight = alpha * onehot_labels * jnp.power(1.0 - p, gamma)
    return jnp.sum(f_weight * cross_entropy, axis=-1) * weight


def one_hot_smooth(
    labels: jnp.ndarray, num_classes: int, epsilon: float = 0.001
) -> jnp.ndarray:
    """One-hot with label smoothing (model_util.one_hot usage,
    label_smoothing_epsilon in the config): on = 1 - eps, off = eps/(K-1)."""
    off = epsilon / (num_classes - 1)
    on = 1.0 - epsilon
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off
