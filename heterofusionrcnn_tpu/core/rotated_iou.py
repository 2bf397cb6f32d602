"""Rotated-rectangle BEV overlap / IoU and 3D IoU, fully vectorized jnp.

TPU-native replacement for the reference's bev_iou CUDA library
(bev_iou/bev_iou_g.cu): instead of per-pair branchy polygon clipping, every
pair enumerates a fixed set of 24 candidate intersection-polygon vertices
(16 edge-edge intersections + 2x4 contained corners) with validity masks,
sorts them by angle around the valid-point centroid, and applies the shoelace
formula — branch-free, static shapes, vmap/vectorized over arbitrary batch
dims. Numerics track the CUDA kernel's predicates (strict sign tests with
EPS=1e-8, point-in-box MARGIN=1e-5) so keep-sets and IoU values match the
reference within float tolerance.
"""

from __future__ import annotations

import jax.numpy as jnp

from heterofusionrcnn_tpu.core.geometry import bev_box_corners, boxes_3d_to_bev

_EPS = 1e-8
_MARGIN = 1e-5


def _cross(o, a, b):
    """2D cross of (a-o) x (b-o); trailing dim 2."""
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        b[..., 0] - o[..., 0]
    ) * (a[..., 1] - o[..., 1])


def _segment_intersections(pa, pb):
    """All 16 edge-edge intersection candidates between two quads.

    Mirrors `intersection()` in bev_iou_g.cu:63-91 (sign tests s1*s2>0 and
    s3*s4>0, parametric intersection point).

    Args:
      pa, pb: (..., 4, 2) corners.
    Returns:
      pts (..., 16, 2), valid (..., 16) bool.
    """
    # Edges: (start, end) = (corner[i], corner[i+1 mod 4]).
    a0 = pa  # (..., 4, 2)
    a1 = jnp.roll(pa, -1, axis=-2)
    b0 = pb
    b1 = jnp.roll(pb, -1, axis=-2)

    # Broadcast to all 16 pairs: a edges on axis -3, b edges on axis -2.
    p0 = a0[..., :, None, :]
    p1 = a1[..., :, None, :]
    q0 = b0[..., None, :, :]
    q1 = b1[..., None, :, :]

    s1 = _cross(p0, q0, p1)  # cross(q0, p1, p0) with CUDA arg order (p1,p2,origin)
    s2 = _cross(p0, p1, q1)
    s3 = _cross(q0, p0, q1)
    s4 = _cross(q0, q1, p1)
    valid = (s1 * s2 > 0) & (s3 * s4 > 0)

    s5 = _cross(p0, q1, p1)
    denom = s5 - s1
    safe = jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)
    ix = (s5 * q0[..., 0] - s1 * q1[..., 0]) / safe
    iy = (s5 * q0[..., 1] - s1 * q1[..., 1]) / safe

    # CUDA fallback for near-parallel lines (denominator ~ 0): general line-
    # line solve. With valid=False in the parallel case (s-tests fail) this
    # rarely triggers; keep the same formula for exactness when it does.
    a0c = p0[..., 1] - p1[..., 1]
    b0c = p1[..., 0] - p0[..., 0]
    c0c = p0[..., 0] * p1[..., 1] - p1[..., 0] * p0[..., 1]
    a1c = q0[..., 1] - q1[..., 1]
    b1c = q1[..., 0] - q0[..., 0]
    c1c = q0[..., 0] * q1[..., 1] - q1[..., 0] * q0[..., 1]
    dd = a0c * b1c - a1c * b0c
    dd_safe = jnp.where(jnp.abs(dd) > 0, dd, 1.0)
    fx = (b0c * c1c - b1c * c0c) / dd_safe
    fy = (a1c * c0c - a0c * c1c) / dd_safe

    use_fallback = jnp.abs(denom) <= _EPS
    ix = jnp.where(use_fallback, fx, ix)
    iy = jnp.where(use_fallback, fy, iy)

    pts = jnp.stack([ix, iy], axis=-1)  # (..., 4, 4, 2)
    shp = pts.shape[:-3] + (16, 2)
    return pts.reshape(shp), valid.reshape(valid.shape[:-2] + (16,))


def _points_in_bev_box(bev_box, pts):
    """check_in_box2d (bev_iou_g.cu:44-60): rotate the point by +angle into
    the box frame and compare against the axis-aligned extent with margin.

    Args:
      bev_box: (..., 5); pts: (..., 4, 2).
    Returns:
      (..., 4) bool.
    """
    x1, z1, x2, z2, ry = (bev_box[..., i] for i in range(5))
    cx = 0.5 * (x1 + x2)
    cz = 0.5 * (z1 + z2)
    # angle_cos = cos(-ry), angle_sin = sin(-ry); rot_x = dx*cos + dz*sin + cx
    c = jnp.cos(-ry)[..., None]
    s = jnp.sin(-ry)[..., None]
    dx = pts[..., 0] - cx[..., None]
    dz = pts[..., 1] - cz[..., None]
    rx = dx * c + dz * s + cx[..., None]
    rz = -dx * s + dz * c + cz[..., None]
    return (
        (rx > x1[..., None] - _MARGIN)
        & (rx < x2[..., None] + _MARGIN)
        & (rz > z1[..., None] - _MARGIN)
        & (rz < z2[..., None] + _MARGIN)
    )


def bev_overlap(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotated-rectangle intersection areas.

    Args:
      boxes_a: (..., 5) and boxes_b: (..., 5) broadcastable BEV boxes
        [x1, z1, x2, z2, ry] — pre-broadcast to pair shape by the caller
        (e.g. a[:, None, :], b[None, :, :] for an (N, M) table).
    Returns:
      (...) overlap areas.
    """
    ca = bev_box_corners(boxes_a)  # (..., 4, 2)
    cb = bev_box_corners(boxes_b)

    inter_pts, inter_valid = _segment_intersections(ca, cb)  # (...,16,2) (...,16)
    a_in_b = _points_in_bev_box(boxes_b, ca)  # (..., 4)
    b_in_a = _points_in_bev_box(boxes_a, cb)

    batch = inter_pts.shape[:-2]
    ca = jnp.broadcast_to(ca, batch + (4, 2))
    cb = jnp.broadcast_to(cb, batch + (4, 2))
    a_in_b = jnp.broadcast_to(a_in_b, batch + (4,))
    b_in_a = jnp.broadcast_to(b_in_a, batch + (4,))
    pts = jnp.concatenate([inter_pts, ca, cb], axis=-2)  # (..., 24, 2)
    valid = jnp.concatenate([inter_valid, a_in_b, b_in_a], axis=-1)  # (..., 24)

    cnt = jnp.sum(valid, axis=-1)  # (...)
    vf = valid[..., None].astype(pts.dtype)
    centroid = jnp.sum(pts * vf, axis=-2) / jnp.maximum(
        cnt[..., None].astype(pts.dtype), 1.0
    )

    ang = jnp.arctan2(
        pts[..., 1] - centroid[..., None, 1], pts[..., 0] - centroid[..., None, 0]
    )
    ang = jnp.where(valid, ang, jnp.inf)  # invalid points sort last
    order = jnp.argsort(ang, axis=-1)
    sorted_pts = jnp.take_along_axis(pts, order[..., None], axis=-2)
    sorted_valid = jnp.take_along_axis(valid, order, axis=-1)

    # Shoelace fan from the first (angle-min) vertex; invalid vertices are
    # collapsed onto v0 so their triangle contributions vanish.
    v0 = sorted_pts[..., 0:1, :]
    fan = jnp.where(sorted_valid[..., None], sorted_pts, v0)
    x = fan[..., 0]
    y = fan[..., 1]
    x0 = x[..., 0:1]
    y0 = y[..., 0:1]
    crosses = (x[..., :-1] - x0) * (y[..., 1:] - y0) - (x[..., 1:] - x0) * (
        y[..., :-1] - y0
    )
    area = 0.5 * jnp.abs(jnp.sum(crosses, axis=-1))
    return jnp.where(cnt >= 3, area, 0.0)


def bev_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise BEV IoU table (compute_bev_iou of the reference).

    Args:
      boxes_a: (N, 5), boxes_b: (M, 5).
    Returns:
      (N, M) IoU.
    """
    ov = bev_overlap(boxes_a[:, None, :], boxes_b[None, :, :])
    sa = (boxes_a[:, 2] - boxes_a[:, 0]) * (boxes_a[:, 3] - boxes_a[:, 1])
    sb = (boxes_b[:, 2] - boxes_b[:, 0]) * (boxes_b[:, 3] - boxes_b[:, 1])
    return ov / jnp.maximum(sa[:, None] + sb[None, :] - ov, _EPS)


def box_3d_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray):
    """Pairwise 3D IoU = BEV overlap x height overlap (hf/core/compute_iou.py
    box3d_iou_tf :23-64).

    Args:
      boxes_a: (N, 7), boxes_b: (M, 7) box_3d.
    Returns:
      (iou_3d (N, M), iou_2d (N, M)).
    """
    bev_a = boxes_3d_to_bev(boxes_a)
    bev_b = boxes_3d_to_bev(boxes_b)
    overlaps_bev = bev_overlap(bev_a[:, None, :], bev_b[None, :, :])
    sa = (bev_a[:, 2] - bev_a[:, 0]) * (bev_a[:, 3] - bev_a[:, 1])
    sb = (bev_b[:, 2] - bev_b[:, 0]) * (bev_b[:, 3] - bev_b[:, 1])
    iou_2d = overlaps_bev / jnp.maximum(sa[:, None] + sb[None, :] - overlaps_bev, _EPS)

    # y points down; box spans [y-h, y].
    a_min = (boxes_a[:, 1] - boxes_a[:, 5])[:, None]
    a_max = boxes_a[:, 1][:, None]
    b_min = (boxes_b[:, 1] - boxes_b[:, 5])[None, :]
    b_max = boxes_b[:, 1][None, :]
    overlaps_h = jnp.clip(
        jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), 0.0, None
    )

    overlaps_3d = overlaps_bev * overlaps_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    iou_3d = overlaps_3d / jnp.clip(vol_a + vol_b - overlaps_3d, 1e-7, None)
    return iou_3d, iou_2d
