"""Oriented (rotated BEV) NMS, TPU-native.

Replaces the reference's CUDA bitmask NMS (bev_iou/bev_iou_g.cu:256-298 +
hf/core/compute_iou.py:67-80) with *blocked greedy NMS*: boxes are sorted by
score once, then processed in blocks of 64 — each round computes one
(64, 64) IoU table for the exact sequential-greedy decision inside the block
and one (64, N) table to suppress the remainder in parallel. Identical
keep-sets to sequential greedy NMS, but the sequential part is 64 tiny VPU
steps per round instead of one dispatch per kept box: for the reference's
eval shapes (9000 pre-NMS, 512 kept) that is ~8 rounds instead of 512
sequential argmax+suppress steps.

Outputs are fixed-size with -1 padding, matching the reference's
`sb_nms_fn` contract (hf/core/models/model_util.py:101-142).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from heterofusionrcnn_tpu.core.rotated_iou import bev_overlap
from heterofusionrcnn_tpu.ops.dispatch import pallas_ok

_EPS = 1e-8
_BLOCK = 64


def _pair_iou(boxes_a, boxes_b):
    """(A, 5) x (B, 5) -> (A, B) rotated IoU."""
    ov = bev_overlap(boxes_a[:, None, :], boxes_b[None, :, :])
    sa = (boxes_a[:, 2] - boxes_a[:, 0]) * (boxes_a[:, 3] - boxes_a[:, 1])
    sb = (boxes_b[:, 2] - boxes_b[:, 0]) * (boxes_b[:, 3] - boxes_b[:, 1])
    return ov / jnp.maximum(sa[:, None] + sb[None, :] - ov, _EPS)


def _block_greedy(iou_cc, cand_valid, thresh):
    """Sequential greedy inside one block: candidate j is kept iff valid and
    no higher-ranked kept candidate overlaps it above thresh."""
    block = cand_valid.shape[0]

    def body(i, state):
        keep, suppressed = state
        k_i = cand_valid[i] & ~suppressed[i]
        keep = keep.at[i].set(k_i)
        newly = k_i & (iou_cc[i] > thresh)
        newly = newly.at[i].set(False)
        return keep, suppressed | newly

    keep0 = jnp.zeros((block,), bool)
    keep, _ = jax.lax.fori_loop(0, block, body, (keep0, jnp.zeros((block,), bool)))
    return keep


@functools.partial(jax.jit, static_argnames=("max_keep", "iou_thresh"))
def oriented_nms(
    bev_boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float,
    max_keep: int,
    valid_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy rotated-rectangle NMS (blocked formulation).

    Args:
      bev_boxes: (N, 5) [x1, z1, x2, z2, ry].
      scores: (N,) confidences.
      iou_thresh: suppress boxes with IoU > thresh against a kept box.
      max_keep: number of output slots (post-NMS size).
      valid_mask: optional (N,) bool; False entries are never selected.
    Returns:
      keep_idx: (max_keep,) int32 indices into the input, -1 padded,
        in descending-score order.
      keep_valid: (max_keep,) bool.
    """
    n = bev_boxes.shape[0]

    # TPU: single fused Pallas kernel (bounded max_keep iterations with all
    # state in VMEM — immune to the blocked version's many-round worst case
    # on heavily overlapping candidates).
    if pallas_ok():
        from heterofusionrcnn_tpu.ops.pallas_nms import oriented_nms_pallas

        return oriented_nms_pallas(
            bev_boxes, scores, float(iou_thresh), max_keep, valid_mask
        )

    block = min(_BLOCK, n)
    order = jnp.argsort(-scores, stable=True)
    sboxes = bev_boxes[order]
    alive = jnp.ones((n,), bool) if valid_mask is None else valid_mask[order]
    arange_n = jnp.arange(n, dtype=jnp.int32)

    def cond(state):
        alive, _, kept_count = state
        return (kept_count < max_keep) & jnp.any(alive)

    def body(state):
        alive, buf, kept_count = state

        # First `_BLOCK` alive boxes in score order.
        key = jnp.where(alive, arange_n, n)
        neg, _ = jax.lax.top_k(-key, block)
        cand_idx = jnp.clip(-neg, 0, n - 1)
        cand_valid = -neg < n

        cboxes = sboxes[cand_idx]  # (BLOCK, 5)
        iou_cc = _pair_iou(cboxes, cboxes)
        keep = _block_greedy(iou_cc, cand_valid, iou_thresh)

        # Cap to the remaining output slots.
        kc = jnp.cumsum(keep)
        remaining = max_keep - kept_count
        keep = keep & (kc <= remaining)
        kc = jnp.cumsum(keep)

        pos = jnp.where(keep, kept_count + kc - 1, max_keep)
        buf = buf.at[pos].set(cand_idx, mode="drop")
        kept_count = kept_count + kc[-1]

        # Parallel suppression of everything by this round's kept boxes.
        iou_kn = _pair_iou(cboxes, sboxes)  # (BLOCK, N)
        sup = jnp.any((iou_kn > iou_thresh) & keep[:, None], axis=0)
        alive = alive & ~sup
        # All processed candidates leave the pool (kept or suppressed).
        alive = alive.at[cand_idx].set(False, mode="drop")
        return alive, buf, kept_count

    buf0 = jnp.full((max_keep,), -1, jnp.int32)
    _, buf, _ = jax.lax.while_loop(
        cond, body, (alive, buf0, jnp.zeros((), jnp.int32))
    )
    keep_valid = buf >= 0
    keep_idx = jnp.where(keep_valid, order[jnp.maximum(buf, 0)], -1).astype(
        jnp.int32
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
    (hf/core/compute_iou.py:67-80). Selection order is by score, identical
    to sorting first."""
    from heterofusionrcnn_tpu.core.geometry import boxes_3d_to_bev

    return oriented_nms(
        boxes_3d_to_bev(boxes_3d), scores, iou_thresh, max_keep, valid_mask
    )
