"""Axis-aligned 2D box utilities (parity with the used surface of
hf/core/box_list.py + box_list_ops.py and box_util.get_iou).

The reference carried the TF OD-API BoxList container; here plain functions
over (..., 4) [x1, y1, x2, y2] arrays — jnp, broadcastable, jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (...)."""
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0.0
    )


def intersection(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection areas: (N, 4) x (M, 4) -> (N, M)."""
    x1 = jnp.maximum(boxes_a[:, None, 0], boxes_b[None, :, 0])
    y1 = jnp.maximum(boxes_a[:, None, 1], boxes_b[None, :, 1])
    x2 = jnp.minimum(boxes_a[:, None, 2], boxes_b[None, :, 2])
    y2 = jnp.minimum(boxes_a[:, None, 3], boxes_b[None, :, 3])
    return jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)


def iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU: (N, 4) x (M, 4) -> (N, M)."""
    inter = intersection(boxes_a, boxes_b)
    union = area(boxes_a)[:, None] + area(boxes_b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-8)


def ioa(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Intersection-over-area of B (the DontCare absorption measure)."""
    inter = intersection(boxes_a, boxes_b)
    return inter / jnp.maximum(area(boxes_b)[None, :], 1e-8)


def clip_to_window(boxes: jnp.ndarray, window) -> jnp.ndarray:
    """Clip boxes to [x_min, y_min, x_max, y_max]."""
    x_min, y_min, x_max, y_max = window
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], x_min, x_max),
            jnp.clip(boxes[..., 1], y_min, y_max),
            jnp.clip(boxes[..., 2], x_min, x_max),
            jnp.clip(boxes[..., 3], y_min, y_max),
        ],
        axis=-1,
    )


def scale(boxes: jnp.ndarray, sx: float, sy: float) -> jnp.ndarray:
    return boxes * jnp.asarray([sx, sy, sx, sy], boxes.dtype)
