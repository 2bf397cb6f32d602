"""Camera projection (parity with hf/core/projection.py and
hf/core/anchor_projector.py tf paths)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from heterofusionrcnn_tpu.core.geometry import box_3d_to_corners


def rect_to_image(pts3d: jnp.ndarray, calib_p2: jnp.ndarray) -> jnp.ndarray:
    """Project rect-frame points into pixels (projection.tf_rect_to_image :5-30).

    Args:
      pts3d: (B, N, 3); calib_p2: (B, 3, 4).
    Returns:
      (B, N, 2) [u, v] float pixels.
    """
    ones = jnp.ones(pts3d.shape[:-1] + (1,), pts3d.dtype)
    hom = jnp.concatenate([pts3d, ones], axis=-1)  # (B, N, 4)
    proj = jnp.einsum(
        "bij,bnj->bni", calib_p2, hom, precision=jax.lax.Precision.HIGHEST
    )
    return proj[..., :2] / proj[..., 2:3]


def project_boxes_to_image_space(
    boxes_3d: jnp.ndarray,
    calib_p2: jnp.ndarray,
    image_w: int,
    image_h: int,
    normalize: bool = True,
):
    """box_3d -> clipped axis-aligned 2D bbox in image space (parity with
    projection.tf_project_to_image_space :33-89): project all 8 corners,
    take min/max, clip to the image.

    Args:
      boxes_3d: (B, n, 7); calib_p2: (B, 3, 4).
    Returns:
      boxes_2d (B, n, 4) [x1, y1, x2, y2], and normalized variant in
      [0, 1] x [0, 1] if requested (else None).
    """
    corners = box_3d_to_corners(boxes_3d)  # (B, n, 8, 3)
    b, n = corners.shape[:2]
    flat = corners.reshape(b, n * 8, 3)
    uv = rect_to_image(flat, calib_p2).reshape(b, n, 8, 2)

    x1 = jnp.clip(jnp.min(uv[..., 0], axis=-1), 0.0, image_w)
    x2 = jnp.clip(jnp.max(uv[..., 0], axis=-1), 0.0, image_w)
    y1 = jnp.clip(jnp.min(uv[..., 1], axis=-1), 0.0, image_h)
    y2 = jnp.clip(jnp.max(uv[..., 1], axis=-1), 0.0, image_h)
    boxes_2d = jnp.stack([x1, y1, x2, y2], axis=-1)

    if not normalize:
        return boxes_2d, None
    scale = jnp.asarray([image_w, image_h, image_w, image_h], boxes_2d.dtype)
    return boxes_2d, boxes_2d / scale


def boxes_2d_to_yxyx(boxes_2d_norm: jnp.ndarray) -> jnp.ndarray:
    """xyxy -> yxyx reorder for image crop-and-resize (parity with
    anchor_projector.reorder_projected_boxes :288-307)."""
    return boxes_2d_norm[..., jnp.array([1, 0, 3, 2])]
