"""Three-nearest-neighbor feature interpolation.

TPU-native replacement for the reference's `interpolate` CUDA library
(interpolate/tf_interpolate_g.cu): `three_nn` is a k=3 KNN, and
`three_interpolate` is an inverse-distance-weighted gather — both map to
top_k + take_along_axis, fully differentiable through XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from heterofusionrcnn_tpu.ops.grouping import pairwise_sqdist


def three_nn(unknown: jnp.ndarray, known: jnp.ndarray):
    """3 nearest known points for every unknown point
    (interpolate/tf_interpolate_g.cu:22-88).

    Args:
      unknown: (B, N, 3) query points; known: (B, M, 3) reference points.
    Returns:
      dist: (B, N, 3) squared distances (ascending); idx: (B, N, 3) int32.
    """
    d = pairwise_sqdist(unknown, known)  # (B, N, M)
    neg, idx = jax.lax.top_k(-d, 3)
    return -neg, idx.astype(jnp.int32)


def three_interpolate(
    points: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """Weighted 3-point feature interpolation (tf_interpolate.py:26-37).

    Args:
      points: (B, M, C) features at known points.
      idx: (B, N, 3) neighbor indices; weight: (B, N, 3) weights.
    Returns:
      (B, N, C) interpolated features.
    """
    b, n, _ = idx.shape
    flat = idx.reshape(b, n * 3)
    gathered = jnp.take_along_axis(points, flat[..., None], axis=1)
    gathered = gathered.reshape(b, n, 3, points.shape[-1])
    return jnp.sum(gathered * weight[..., None], axis=2)


def three_interpolate_inverse_distance(
    unknown: jnp.ndarray, known: jnp.ndarray, features: jnp.ndarray
) -> jnp.ndarray:
    """Fused three_nn + inverse-distance weights + interpolation, matching
    the PointNet++ FP-module weight recipe (hf/core/feature_extractors/
    pointnet_util.py:303-308): w_i = (1/d_i) / sum_j (1/d_j) with
    d = max(d, 1e-10)."""
    dist, idx = three_nn(unknown, known)
    dist = jnp.maximum(dist, 1e-10)
    inv = 1.0 / dist
    weight = inv / jnp.sum(inv, axis=-1, keepdims=True)
    return three_interpolate(features, idx, weight)
