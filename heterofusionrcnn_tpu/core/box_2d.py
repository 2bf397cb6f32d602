"""Axis-aligned 2D box utilities (parity with hf/core/box_list.py +
box_list_ops.py and box_util.get_iou).

The reference carried the TF OD-API BoxList container (yxyx, dynamic-size
prune/gather via tf.where); here plain functions over (..., 4)
[x1, y1, x2, y2] arrays — jnp, broadcastable, jit-safe. Dynamic-size ops
(`prune_*`, `boolean_mask`) become mask-returning functions so callers can
stay static-shape (mask + where) or compact on the host (np.flatnonzero).
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


def height_width(boxes: jnp.ndarray):
    """(..., 4) -> (height (...,), width (...,)) (box_list_ops.py:60-77)."""
    return boxes[..., 3] - boxes[..., 1], boxes[..., 2] - boxes[..., 0]


def matched_intersection(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray):
    """Elementwise intersection areas of corresponding boxes: (N, 4) x (N, 4)
    -> (N,) (box_list_ops.py:131-157)."""
    x1 = jnp.maximum(boxes_a[..., 0], boxes_b[..., 0])
    y1 = jnp.maximum(boxes_a[..., 1], boxes_b[..., 1])
    x2 = jnp.minimum(boxes_a[..., 2], boxes_b[..., 2])
    y2 = jnp.minimum(boxes_a[..., 3], boxes_b[..., 3])
    return jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)


def matched_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray):
    """Elementwise IoU of corresponding boxes (box_list_ops.py:181-203).
    Zero-union pairs return 0 (the reference's tf.where(equal(inter, 0))
    guard)."""
    inter = matched_intersection(boxes_a, boxes_b)
    union = area(boxes_a) + area(boxes_b) - inter
    return jnp.where(inter > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def sq_dist(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray):
    """Pairwise squared distances between boxes as 4-d points: (N, 4) x
    (M, 4) -> (N, M) (box_list_ops.py:305-334)."""
    sq_a = jnp.sum(boxes_a * boxes_a, axis=-1, keepdims=True)  # (N, 1)
    sq_b = jnp.sum(boxes_b * boxes_b, axis=-1, keepdims=True)  # (M, 1)
    return sq_a + sq_b.T - 2.0 * boxes_a @ boxes_b.T


def change_coordinate_frame(boxes: jnp.ndarray, window) -> jnp.ndarray:
    """Re-express boxes relative to `window` [x_min, y_min, x_max, y_max]:
    the window min corner maps to (0, 0) and the max corner to (1, 1)
    (box_list_ops.py:271-304, xyxy here)."""
    x_min, y_min, x_max, y_max = window
    shifted = boxes - jnp.asarray(
        [x_min, y_min, x_min, y_min], dtype=boxes.dtype
    )
    return scale(shifted, 1.0 / (x_max - x_min), 1.0 / (y_max - y_min))


def prune_small_boxes_mask(boxes: jnp.ndarray, min_side) -> jnp.ndarray:
    """True for boxes with BOTH sides >= min_side (box_list_ops.py:252-269;
    mask form — gather with it to compact)."""
    h, w = height_width(boxes)
    return (w >= min_side) & (h >= min_side)


def prune_non_overlapping_mask(
    boxes_a: jnp.ndarray, boxes_b: jnp.ndarray, min_overlap: float = 0.0
) -> jnp.ndarray:
    """True for each box in A whose IOA with at least one box in B is
    >= min_overlap (box_list_ops.py:225-250; mask form). IOA here is
    intersection / area(A box), matching the reference's ioa(boxlist2,
    boxlist1) orientation."""
    # ioa(b, a)[m, n] = inter(b_m, a_n) / area(a_n); max over m.
    best = jnp.max(ioa(boxes_b, boxes_a), axis=0)  # (N,)
    return best >= min_overlap
