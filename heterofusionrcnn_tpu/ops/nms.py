"""Oriented (rotated BEV) NMS, TPU-native.

Replaces the reference's CUDA bitmask NMS (bev_iou/bev_iou_g.cu:256-298 +
hf/core/compute_iou.py:67-80). Greedy NMS is sequential in the number of
*kept* boxes, not the number of candidates — so instead of an N x N IoU
bitmask we run `post_nms_size` scan steps, each one an argmax over masked
scores plus one (N,)-wide vectorized rotated-IoU row. For the reference's
shapes (N=9000 pre-NMS, 512 kept) this is 512 * 9000 IoU evaluations instead
of 9000^2 — ~17x less work and static-shape friendly.

Outputs are fixed-size with -1 padding, matching the reference's
`sb_nms_fn` contract (hf/core/models/model_util.py:101-142).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from heterofusionrcnn_tpu.core.rotated_iou import bev_overlap

_EPS = 1e-8


@functools.partial(jax.jit, static_argnames=("max_keep",))
def oriented_nms(
    bev_boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float,
    max_keep: int,
    valid_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy rotated-rectangle NMS.

    Args:
      bev_boxes: (N, 5) [x1, z1, x2, z2, ry].
      scores: (N,) confidences.
      iou_thresh: suppress boxes with IoU > thresh against a kept box.
      max_keep: number of output slots (post-NMS size).
      valid_mask: optional (N,) bool; False entries are never selected.
    Returns:
      keep_idx: (max_keep,) int32 indices into the input, -1 padded.
      keep_valid: (max_keep,) bool.
    """
    n = bev_boxes.shape[0]
    areas = (bev_boxes[:, 2] - bev_boxes[:, 0]) * (bev_boxes[:, 3] - bev_boxes[:, 1])

    alive = jnp.ones((n,), bool) if valid_mask is None else valid_mask
    neg_inf = jnp.array(-jnp.inf, scores.dtype)

    def step(alive, _):
        masked = jnp.where(alive, scores, neg_inf)
        best = jnp.argmax(masked)
        ok = masked[best] > neg_inf
        box = bev_boxes[best]
        ov = bev_overlap(box[None, :], bev_boxes)  # (N,)
        iou = ov / jnp.maximum(areas[best] + areas - ov, _EPS)
        suppress = iou > iou_thresh
        alive = alive & ~suppress & (jnp.arange(n) != best)
        return alive, (jnp.where(ok, best, -1).astype(jnp.int32), ok)

    _, (keep_idx, keep_valid) = jax.lax.scan(
        step, alive, None, length=max_keep
    )
    return keep_idx, keep_valid


def oriented_nms_boxes_3d(
    boxes_3d: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float,
    max_keep: int,
    valid_mask: jnp.ndarray | None = None,
):
    """box_3d-input convenience twin of the reference's oriented_nms_tf
    (hf/core/compute_iou.py:67-80). Selection order is by score (argmax each
    step), identical to sorting first."""
    from heterofusionrcnn_tpu.core.geometry import boxes_3d_to_bev

    return oriented_nms(
        boxes_3d_to_bev(boxes_3d), scores, iou_thresh, max_keep, valid_mask
    )
