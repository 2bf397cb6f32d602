"""Rotated-rectangle BEV overlap / IoU and 3D IoU, fully vectorized jnp.

TPU-native replacement for the reference's bev_iou CUDA library
(bev_iou/bev_iou_g.cu). The overlap is computed with the Green's-theorem
line-integral form of convex polygon intersection: the boundary of A|B is
(dA clipped to B) + (dB clipped to A); for a segment P->Q parameterized by
t in [t0, t1], the integral of (x dz - z dx) equals (t1 - t0)*cross(P, Q) -
the integrand is constant along a straight edge - and each [t0, t1] is the
single interval where the segment lies inside the (convex) other rectangle,
found by 4 branch-free half-plane entry/exit tests. Area = 0.5 * sum.

Why this formulation: it is exact (same values as the CUDA polygon clip up
to float EPS at degenerate boundaries), and needs no vertex buffers, sorts,
scatters or gathers - just ~450 elementwise flops per pair laid out SoA, so
the large pair dimension stays the TPU lane dimension with zero padding
waste. Broadcasts over arbitrary leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from heterofusionrcnn_tpu.core.geometry import boxes_3d_to_bev

_EPS = 1e-8


def _bev_corners_soa(boxes):
    """BEV box (..., 5) -> per-corner coordinate lists (4 x's, 4 z's).

    Same rotation convention as geometry.bev_box_corners (the x/z projection
    of the 3D corner math): x' = dx*cos + dz*sin + cx, z' = -dx*sin + dz*cos.
    Corner order [(x1,z1),(x2,z1),(x2,z2),(x1,z2)] is CCW in (x, z).
    """
    x1, z1, x2, z2, ry = (boxes[..., i] for i in range(5))
    cx = 0.5 * (x1 + x2)
    cz = 0.5 * (z1 + z2)
    c = jnp.cos(ry)
    s = jnp.sin(ry)
    xs = []
    zs = []
    for dx_sign, dz_sign in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
        dx = dx_sign * 0.5 * (x2 - x1)
        dz = dz_sign * 0.5 * (z2 - z1)
        xs.append(dx * c + dz * s + cx)
        zs.append(-dx * s + dz * c + cz)
    return xs, zs


def _edges_in_poly_integral(ax, az, bx, bz, drop_same_dir_collinear=False):
    """Sum of line integrals of A's edges clipped to rectangle B.

    Degenerate shared boundaries: a segment lying exactly on a clip edge
    belongs to the intersection boundary once. When ∂A and ∂B coincide with
    the SAME direction (identical/nested-boundary boxes) the segment would be
    counted by both passes, so the pass with `drop_same_dir_collinear=True`
    (the B-in-A pass) excludes it; when they coincide with OPPOSITE
    directions (touching boxes, zero-area overlap) both passes keep it and
    the two traversals cancel exactly.

    Args:
      ax, az: lists of 4 (...)-shaped corner coordinates of A (CCW).
      bx, bz: same for the clip rectangle B (CCW).
    Returns:
      (...) sum over A's edges of (t1 - t0) * cross(P, Q).
    """
    total = 0.0
    for e in range(4):
        px, pz = ax[e], az[e]
        qx, qz = ax[(e + 1) % 4], az[(e + 1) % 4]

        t0 = jnp.zeros_like(px)
        t1 = jnp.ones_like(px)
        for h in range(4):
            hx0, hz0 = bx[h], bz[h]
            ex = bx[(h + 1) % 4] - hx0
            ez = bz[(h + 1) % 4] - hz0
            # Signed distance to the half-plane (interior side is >= 0 for a
            # CCW clip polygon).
            d0 = ex * (pz - hz0) - ez * (px - hx0)
            d1 = ex * (qz - hz0) - ez * (qx - hx0)
            denom = d0 - d1
            t_cross = d0 / jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)

            entering = (d0 < 0) & (d1 >= 0)
            leaving = (d0 >= 0) & (d1 < 0)
            both_out = (d0 < 0) & (d1 < 0)

            if drop_same_dir_collinear:
                collinear = (jnp.abs(d0) <= _EPS) & (jnp.abs(d1) <= _EPS)
                same_dir = (qx - px) * ex + (qz - pz) * ez > 0
                both_out = both_out | (collinear & same_dir)

            t0 = jnp.maximum(t0, jnp.where(entering, t_cross, 0.0))
            t1 = jnp.minimum(t1, jnp.where(leaving, t_cross, 1.0))
            # Fully outside this half-plane: empty interval.
            t1 = jnp.where(both_out, -1.0, t1)

        span = jnp.maximum(t1 - t0, 0.0)
        total = total + span * (px * qz - pz * qx)
    return total


def bev_overlap(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotated-rectangle intersection areas.

    Args:
      boxes_a: (..., 5) and boxes_b: (..., 5) broadcastable BEV boxes
        [x1, z1, x2, z2, ry] - pre-broadcast to pair shape by the caller
        (e.g. a[:, None, :], b[None, :, :] for an (N, M) table).
    Returns:
      (...) overlap areas.
    """
    ax, az = _bev_corners_soa(boxes_a)
    bx, bz = _bev_corners_soa(boxes_b)
    total = _edges_in_poly_integral(ax, az, bx, bz)
    total = total + _edges_in_poly_integral(
        bx, bz, ax, az, drop_same_dir_collinear=True
    )
    return jnp.maximum(0.5 * total, 0.0)


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
