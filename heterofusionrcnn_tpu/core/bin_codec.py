"""Bin-based 3D box codec (parity with hf/core/bin_based_box3d_encoder.py).

A 3D box is regressed relative to a reference point (an RPN foreground point
or an RCNN proposal center) as:
  - x/z offsets: a classification over ``2*S/DELTA`` bins of width DELTA
    covering [-S, +S] around the reference, plus a normalized residual within
    the chosen bin (residual in units of DELTA);
  - theta: bins of width DELTA_THETA over [-R, +R] around the reference
    heading, residual normalized by DELTA_THETA/2;
  - y: a direct residual;
  - size: per-class residual relative to the class mean size, normalized by
    the mean size.

Per-class search ranges: ``S`` and ``DELTA`` are (K,) arrays (one per class,
rpn_xz_search_range / rpn_xz_bin_len in the config).

The RPN and RCNN variants differ only in the theta-target canonicalization:
the RPN clips dtheta+R into [0, 2R); the RCNN (whose reference heading is the
proposal's) first flips headings pointing backwards by pi and wraps into
[-R, +R] (reference :232-242).

All functions take arbitrary leading batch dims; `ref_pts` is (..., 3),
`ref_theta` is (...,) or the python scalar 0.0 for the RPN (no rotation into a
reference frame).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_EPS_BIN = 1e-3


def _rotate_into_frame(dx, dz, theta):
    """Rotate world-frame offsets into the reference-heading frame.

    Matches the reference encode path (bin_based_box3d_encoder.py:168-223,
    where ``all_rys = -ref_theta``): dx' = cos(t)*dx - sin(t)*dz,
    dz' = sin(t)*dx + cos(t)*dz.
    """
    c, s = jnp.cos(theta), jnp.sin(theta)
    return c * dx - s * dz, s * dx + c * dz


def _rotate_from_frame(dx, dz, theta):
    """Inverse of :func:`_rotate_into_frame` (decode path, reference :55-76):
    dx' = cos(t)*dx + sin(t)*dz, dz' = -sin(t)*dx + cos(t)*dz."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return c * dx + s * dz, -s * dx + c * dz


def decode(
    ref_pts: jnp.ndarray,
    ref_theta,
    bin_x: jnp.ndarray,
    res_x_norm: jnp.ndarray,
    bin_z: jnp.ndarray,
    res_z_norm: jnp.ndarray,
    bin_theta: jnp.ndarray,
    res_theta_norm: jnp.ndarray,
    res_y: jnp.ndarray,
    res_size_norm: jnp.ndarray,
    mean_sizes: jnp.ndarray,
    S,
    DELTA,
    R: float,
    DELTA_THETA: float,
) -> jnp.ndarray:
    """Bin-based representation → box_3d (reference tf_decode :9-137).

    Args:
      ref_pts: (..., 3) reference points.
      ref_theta: (...,) reference headings, or scalar 0.0.
      bin_x, bin_z, bin_theta: (..., K) int bin assignments (one per class).
      res_*_norm, res_y: (..., K) residuals; res_size_norm: (..., K, 3).
      mean_sizes: (..., K, 3) or (K, 3) class mean sizes [l, w, h].
      S, DELTA: scalars or (K,) per-class XZ search range / bin length.
      R, DELTA_THETA: theta search range / bin length.
    Returns:
      (..., K, 7) boxes_3d.
    """
    S = jnp.asarray(S, jnp.float32)
    DELTA = jnp.asarray(DELTA, jnp.float32)
    dx = (bin_x.astype(jnp.float32) + 0.5) * DELTA - S + res_x_norm * DELTA
    dz = (bin_z.astype(jnp.float32) + 0.5) * DELTA - S + res_z_norm * DELTA

    theta_is_array = isinstance(ref_theta, jnp.ndarray)
    if theta_is_array:
        t = ref_theta[..., None]  # broadcast over K
        dx, dz = _rotate_from_frame(dx, dz, t)
    else:
        assert ref_theta == 0
        t = 0.0

    x = dx + ref_pts[..., None, 0]
    z = dz + ref_pts[..., None, 2]
    y = res_y + ref_pts[..., None, 1]

    theta = (
        t
        + (bin_theta.astype(jnp.float32) + 0.5) * DELTA_THETA
        - R
        + res_theta_norm * 0.5 * DELTA_THETA
    )
    if not theta_is_array:
        theta = jnp.broadcast_to(theta, x.shape)

    size = mean_sizes + res_size_norm * mean_sizes  # (..., K, 3)
    return jnp.stack(
        [x, y, z, size[..., 0], size[..., 1], size[..., 2], theta], axis=-1
    )


def _encode_common(dx, dz, dtheta_shift, dy, dsize, mean_sizes, S, DELTA, DELTA_THETA, K):
    """Shared binning math of the encode paths (reference :244-258)."""
    S = jnp.asarray(S, jnp.float32)
    DELTA = jnp.asarray(DELTA, jnp.float32)

    dx = jnp.repeat(dx[..., None], K, axis=-1)
    dz = jnp.repeat(dz[..., None], K, axis=-1)

    dx_shift = jnp.clip(dx + S, 0.0, 2.0 * S - _EPS_BIN)
    bin_x = jnp.floor(dx_shift / DELTA)
    res_x_norm = (dx_shift - (bin_x + 0.5) * DELTA) / DELTA

    dz_shift = jnp.clip(dz + S, 0.0, 2.0 * S - _EPS_BIN)
    bin_z = jnp.floor(dz_shift / DELTA)
    res_z_norm = (dz_shift - (bin_z + 0.5) * DELTA) / DELTA

    bin_theta = jnp.floor(dtheta_shift / DELTA_THETA)
    res_theta_norm = (dtheta_shift - (bin_theta + 0.5) * DELTA_THETA) / (
        0.5 * DELTA_THETA
    )

    return (
        bin_x.astype(jnp.int32),
        res_x_norm,
        bin_z.astype(jnp.int32),
        res_z_norm,
        bin_theta.astype(jnp.int32),
        res_theta_norm,
        dy,
        dsize / mean_sizes,
    )


def encode_rpn(
    ref_pts: jnp.ndarray,
    boxes_3d: jnp.ndarray,
    mean_sizes: jnp.ndarray,
    S,
    DELTA,
    R: float,
    DELTA_THETA: float,
    K: int,
):
    """box_3d → bin representation, RPN flavor (ref_theta = 0; reference
    tf_encode ndims==3 branch :164-198).

    Args:
      ref_pts: (..., 3); boxes_3d: (..., 7); mean_sizes: (..., 3) per-point
        (already gathered for the GT class of each point).
    Returns:
      (bin_x, res_x_norm, bin_z, res_z_norm, bin_theta, res_theta_norm,
       res_y, res_size_norm) — bins (..., K) int32, theta/y/size (...,)/(...,3).
    """
    dx = boxes_3d[..., 0] - ref_pts[..., 0]
    dy = boxes_3d[..., 1] - ref_pts[..., 1]
    dz = boxes_3d[..., 2] - ref_pts[..., 2]
    dsize = boxes_3d[..., 3:6] - mean_sizes
    dtheta = boxes_3d[..., 6]
    dtheta_shift = jnp.clip(dtheta + R, 0.0, 2.0 * R - _EPS_BIN)
    return _encode_common(
        dx, dz, dtheta_shift, dy, dsize, mean_sizes, S, DELTA, DELTA_THETA, K
    )


def encode_rcnn(
    ref_pts: jnp.ndarray,
    ref_theta: jnp.ndarray,
    boxes_3d: jnp.ndarray,
    mean_sizes: jnp.ndarray,
    S,
    DELTA,
    R: float,
    DELTA_THETA: float,
    K: int,
):
    """box_3d → bin representation relative to a proposal, RCNN flavor
    (reference tf_encode ndims==2 branch :199-242): offsets are rotated into
    the proposal frame; the heading delta is canonically wrapped so boxes
    pointing backwards are flipped by pi, then shifted into [eps, 2R-eps].
    """
    dx = boxes_3d[..., 0] - ref_pts[..., 0]
    dy = boxes_3d[..., 1] - ref_pts[..., 1]
    dz = boxes_3d[..., 2] - ref_pts[..., 2]
    dx, dz = _rotate_into_frame(dx, dz, ref_theta)

    dsize = boxes_3d[..., 3:6] - mean_sizes

    two_pi = 2.0 * math.pi
    dtheta = boxes_3d[..., 6] - jnp.mod(ref_theta, two_pi)
    dtheta = jnp.mod(dtheta, two_pi)
    dtheta = jnp.where(
        (dtheta > 0.5 * math.pi) & (dtheta < 1.5 * math.pi),
        jnp.mod(dtheta + math.pi, two_pi),
        dtheta,
    )
    dtheta_shift = jnp.mod(dtheta + 0.5 * math.pi, two_pi)
    dtheta_shift = jnp.clip(dtheta_shift - R, _EPS_BIN, 2.0 * R - _EPS_BIN)

    return _encode_common(
        dx, dz, dtheta_shift, dy, dsize, mean_sizes, S, DELTA, DELTA_THETA, K
    )
