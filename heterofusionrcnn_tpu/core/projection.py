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


def project_anchors_to_bev(anchors: jnp.ndarray, bev_extents):
    """Axis-aligned anchors -> BEV-map boxes (parity with
    anchor_projector.project_to_bev :13-79; anchors are rotated only 0/90
    degrees, so the footprint is the axis-aligned dim_x x dim_z rectangle).

    Args:
      anchors: (N, 6) [x, y, z, dim_x, dim_y, dim_z].
      bev_extents: ((min_x, max_x), (min_z, max_z)) xz extents of the map.
    Returns:
      bev_box_corners: (N, 4) [x1, z1, x2, z2] in map coordinates (origin
        top-left: z is flipped and both axes shifted by the extent minimum);
      bev_box_corners_norm: same corners as a fraction of the map size.
    """
    anchors = jnp.asarray(anchors)
    (x_min, x_max), (z_min, z_max) = (
        (bev_extents[0][0], bev_extents[0][1]),
        (bev_extents[1][0], bev_extents[1][1]),
    )
    x = anchors[:, 0]
    z = anchors[:, 2]
    half_x = anchors[:, 3] / 2.0
    half_z = anchors[:, 5] / 2.0

    x1 = x - half_x
    x2 = x + half_x
    # Flip z (map origin is the top-left corner).
    z1 = z_max - (z + half_z)
    z2 = z_max - (z - half_z)

    corners = jnp.stack([x1, z1, x2, z2], axis=1)
    offset = jnp.asarray([x_min, z_min, x_min, z_min], corners.dtype)
    corners = corners - offset
    ranges = jnp.asarray(
        [x_max - x_min, z_max - z_min, x_max - x_min, z_max - z_min],
        corners.dtype,
    )
    return corners, corners / ranges


def project_anchors_to_image_space(
    anchors: jnp.ndarray, calib_p2: jnp.ndarray, image_shape
):
    """Axis-aligned anchors -> 2D image bbox (parity with
    anchor_projector.project_to_image_space :80-171 / tf twin :173-286):
    project the 8 axis-aligned corners, take per-anchor min/max, normalize
    by [w, h]. No clipping — the reference's anchor variant doesn't clip.

    Args:
      anchors: (N, 6) [x, y, z, dim_x, dim_y, dim_z]; calib_p2: (3, 4).
      image_shape: (h, w).
    Returns:
      (box_corners (N, 4) [x1, y1, x2, y2], box_corners_norm (N, 4)).
    """
    anchors = jnp.asarray(anchors)
    x, y, z = anchors[:, 0], anchors[:, 1], anchors[:, 2]
    hx, dy, hz = anchors[:, 3] / 2.0, anchors[:, 4], anchors[:, 5] / 2.0
    sx = jnp.asarray([1, 1, -1, -1, 1, 1, -1, -1], anchors.dtype)
    sz = jnp.asarray([1, -1, -1, 1, 1, -1, -1, 1], anchors.dtype)
    top = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1], anchors.dtype)
    cx = x[:, None] + hx[:, None] * sx
    cy = y[:, None] - dy[:, None] * top
    cz = z[:, None] + hz[:, None] * sz
    corners = jnp.stack([cx, cy, cz], axis=-1)  # (N, 8, 3)

    uv = rect_to_image(
        corners.reshape(1, -1, 3), jnp.asarray(calib_p2)[None]
    ).reshape(-1, 8, 2)
    box = jnp.stack(
        [
            jnp.min(uv[..., 0], axis=1),
            jnp.min(uv[..., 1], axis=1),
            jnp.max(uv[..., 0], axis=1),
            jnp.max(uv[..., 1], axis=1),
        ],
        axis=1,
    )
    h, w = image_shape[0], image_shape[1]
    scale = jnp.asarray([w, h, w, h], box.dtype)
    return box, box / scale


def boxes_2d_to_yxyx(boxes_2d_norm: jnp.ndarray) -> jnp.ndarray:
    """xyxy -> yxyx reorder for image crop-and-resize (parity with
    anchor_projector.reorder_projected_boxes :288-307)."""
    return boxes_2d_norm[..., jnp.array([1, 0, 3, 2])]
