"""Box-geometry core: formats, corner computation, point-in-box tests.

Formats (camera rectified frame, KITTI conventions — parity with the
reference's hf/core/box_3d_encoder.py and hf/core/box_8c_encoder.py):

  box_3d : ``[x, y, z, l, w, h, ry]`` — (x, y, z) is the center of the box
      *bottom* face (y points down, so the top face is at ``y - h``); ``l``
      extends along the box local x-axis, ``w`` along local z; ``ry`` is the
      rotation around the camera y-axis.
  box_8c : ``(..., 8, 3)`` ordered corners P1..P8 — P1..P4 on the bottom face,
      P5..P8 on the top face, with the ordering documented in the reference
      (hf/core/box_8c_encoder.py:20-37). Corner k+4 is directly above corner k.
  bev box: ``[x1, z1, x2, z2, ry]`` axis-aligned extent before rotation; the
      oriented rectangle is the axis-aligned one rotated by ``ry`` around its
      center (hf/core/compute_iou.py:7-20 + bev_iou/bev_iou_g.cu).

All functions are pure jnp, broadcast over arbitrary leading batch dims and are
jit/vmap/grad-safe with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Corner sign patterns for the 8 ordered corners (reference
# hf/core/box_8c_encoder.py:44-57): x signs in units of l/2, z signs in units
# of w/2; bottom corners (0..3) have y-offset 0, top corners (4..7) have -h.
_CORNER_X_SIGNS = jnp.array([1, 1, -1, -1, 1, 1, -1, -1], jnp.float32)
_CORNER_Z_SIGNS = jnp.array([1, -1, -1, 1, 1, -1, -1, 1], jnp.float32)
_CORNER_Y_TOP = jnp.array([0, 0, 0, 0, -1, -1, -1, -1], jnp.float32)


def rotation_y(ry: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices around the camera y-axis.

    Applied as ``row_vector @ R`` to match the reference's
    ``np.matmul(corners, R_list)`` (hf/core/box_8c_encoder.py:60-84):
    ``x' = x*cos + z*sin``, ``z' = -x*sin + z*cos``.

    Args:
      ry: (...,) rotation angles.
    Returns:
      (..., 3, 3) rotation matrices.
    """
    c, s = jnp.cos(ry), jnp.sin(ry)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    rows = jnp.stack(
        [
            jnp.stack([c, zeros, -s], axis=-1),
            jnp.stack([zeros, ones, zeros], axis=-1),
            jnp.stack([s, zeros, c], axis=-1),
        ],
        axis=-2,
    )
    return rows


def box_3d_to_corners(boxes_3d: jnp.ndarray) -> jnp.ndarray:
    """box_3d → 8 ordered corners (box_8co of the reference).

    Args:
      boxes_3d: (..., 7) [x, y, z, l, w, h, ry].
    Returns:
      (..., 8, 3) corners, order preserved (P1..P8).
    """
    l = boxes_3d[..., 3]
    w = boxes_3d[..., 4]
    h = boxes_3d[..., 5]
    ry = boxes_3d[..., 6]

    x_c = 0.5 * l[..., None] * _CORNER_X_SIGNS  # (..., 8)
    z_c = 0.5 * w[..., None] * _CORNER_Z_SIGNS
    y_c = h[..., None] * _CORNER_Y_TOP
    local = jnp.stack([x_c, y_c, z_c], axis=-1)  # (..., 8, 3)

    rot = rotation_y(ry)  # (..., 3, 3)
    rotated = jnp.einsum(
        "...kc,...cd->...kd", local, rot, precision=jax.lax.Precision.HIGHEST
    )
    center = boxes_3d[..., None, 0:3]
    return rotated + center


def boxes_3d_to_bev(boxes_3d: jnp.ndarray) -> jnp.ndarray:
    """box_3d → BEV 5-tuple [x1, z1, x2, z2, ry] (hf/core/compute_iou.py:7-20)."""
    cu = boxes_3d[..., 0]
    cv = boxes_3d[..., 2]
    half_l = boxes_3d[..., 3] * 0.5
    half_w = boxes_3d[..., 4] * 0.5
    return jnp.stack(
        [cu - half_l, cv - half_w, cu + half_l, cv + half_w, boxes_3d[..., 6]],
        axis=-1,
    )


def bev_box_corners(bev_boxes: jnp.ndarray) -> jnp.ndarray:
    """Oriented BEV rectangle corners.

    Matches the CUDA kernel's construction (bev_iou/bev_iou_g.cu:94-98,
    118-143): axis-aligned corners [(x1,z1),(x2,z1),(x2,z2),(x1,z2)] rotated
    around the rectangle center with
    ``x' = (x-cx)cos + (z-cz)sin + cx``, ``z' = -(x-cx)sin + (z-cz)cos + cz``
    — the same rotation the 3D corner math applies in the x/z plane, so these
    corners coincide with the BEV projection of :func:`box_3d_to_corners`.

    Args:
      bev_boxes: (..., 5) [x1, z1, x2, z2, ry].
    Returns:
      (..., 4, 2) corners.
    """
    x1, z1, x2, z2, ry = (bev_boxes[..., i] for i in range(5))
    cx = 0.5 * (x1 + x2)
    cz = 0.5 * (z1 + z2)
    xs = jnp.stack([x1, x2, x2, x1], axis=-1) - cx[..., None]  # (..., 4)
    zs = jnp.stack([z1, z1, z2, z2], axis=-1) - cz[..., None]
    c = jnp.cos(ry)[..., None]
    s = jnp.sin(ry)[..., None]
    xr = xs * c + zs * s + cx[..., None]
    zr = -xs * s + zs * c + cz[..., None]
    return jnp.stack([xr, zr], axis=-1)


def points_in_box_3d(
    points: jnp.ndarray, corners: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """Oriented-box membership test via three dot-product interval tests.

    Mirrors the reference's u/v/w projection test (hf/core/obj_utils.py:425-484
    and cropping/tf_cropping_g.cu:7-41): with corners P1..P8, the edge vectors
    u = P1-P2 (local x), v = P3-P2 (local z), w = P6-P2 (local -y, up) span the
    box from origin corner P2; a point p is inside iff each projection of
    (p - P2) onto {u, v, w} lies in [0, |edge|^2].

    Args:
      points: (..., N, 3).
      corners: (..., 8, 3) ordered box corners.
    Returns:
      (..., N) boolean mask.
    """
    p2 = corners[..., 1, :]
    u = corners[..., 0, :] - p2
    v = corners[..., 2, :] - p2
    w = corners[..., 5, :] - p2
    d = points - p2[..., None, :]  # (..., N, 3)

    def _interval(axis):
        proj = jnp.einsum("...nc,...c->...n", d, axis)
        sq = jnp.sum(axis * axis, axis=-1)[..., None]
        return (proj >= -eps) & (proj <= sq + eps)

    return _interval(u) & _interval(v) & _interval(w)


def canonical_transform(
    points: jnp.ndarray, boxes_3d: jnp.ndarray
) -> jnp.ndarray:
    """Transform points into each box's canonical frame.

    The RCNN canonical transform (hf/core/models/rcnn_model.py:206-235):
    translate by -center then rotate by -ry so the box's heading aligns with
    +x. Inverse of the corner rotation above.

    Args:
      points: (..., N, 3) points (same leading dims as boxes).
      boxes_3d: (..., 7).
    Returns:
      (..., N, 3) canonical-frame points.
    """
    shifted = points - boxes_3d[..., None, 0:3]
    rot = rotation_y(-boxes_3d[..., 6])
    return jnp.einsum(
        "...nc,...cd->...nd", shifted, rot, precision=jax.lax.Precision.HIGHEST
    )


def canonical_untransform(
    points: jnp.ndarray, boxes_3d: jnp.ndarray
) -> jnp.ndarray:
    """Inverse of :func:`canonical_transform`."""
    rot = rotation_y(boxes_3d[..., 6])
    rotated = jnp.einsum(
        "...nc,...cd->...nd", points, rot, precision=jax.lax.Precision.HIGHEST
    )
    return rotated + boxes_3d[..., None, 0:3]


def box_3d_volume(boxes_3d: jnp.ndarray) -> jnp.ndarray:
    """l*w*h volume."""
    return boxes_3d[..., 3] * boxes_3d[..., 4] * boxes_3d[..., 5]


def expand_box_3d(boxes_3d: jnp.ndarray, context: float) -> jnp.ndarray:
    """Grow the box by the RCNN pooling context
    (hf/core/models/rcnn_model.py:461-475): l, w, h each grow by 2*context and
    the bottom-face y shifts down by +context, so the box expands symmetrically
    in all three axes."""
    x, y, z, l, w, h, ry = (boxes_3d[..., i] for i in range(7))
    return jnp.stack(
        [
            x,
            y + context,
            z,
            l + 2.0 * context,
            w + 2.0 * context,
            h + 2.0 * context,
            ry,
        ],
        axis=-1,
    )
