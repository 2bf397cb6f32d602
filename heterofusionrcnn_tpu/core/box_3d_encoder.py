"""box_3d <-> anchor format conversions (parity with hf/core/
box_3d_encoder.py :61-286).

anchor format: [x, y, z, dim_x, dim_y, dim_z] — axis-aligned extents in the
camera frame. box_3d -> anchor projects the (possibly rotated) box onto the
axes; with `ortho_rotate` the rotation snaps to the nearest multiple of 90
degrees first, otherwise dims are the rotated bounding extents.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def box_3d_to_anchor(boxes_3d, ortho_rotate: bool = False):
    """(..., 7) box_3d -> (..., 6) anchor (reference :61-129)."""
    boxes_3d = jnp.asarray(boxes_3d)
    x, y, z, l, w, h, ry = (boxes_3d[..., i] for i in range(7))

    if ortho_rotate:
        half_pi = math.pi / 2
        ry = jnp.round(ry / half_pi) * half_pi

    cos_ry = jnp.abs(jnp.cos(ry))
    sin_ry = jnp.abs(jnp.sin(ry))
    dim_x = l * cos_ry + w * sin_ry
    dim_z = w * cos_ry + l * sin_ry
    return jnp.stack([x, y, z, dim_x, h, dim_z], axis=-1)


def anchor_to_box_3d(anchors):
    """(..., 6) anchor -> (..., 7) box_3d with ry = 0 (reference
    anchors_to_box_3d :132-160): l = dim_x, w = dim_z, h = dim_y."""
    anchors = jnp.asarray(anchors)
    x, y, z, dx, dy, dz = (anchors[..., i] for i in range(6))
    zeros = jnp.zeros_like(x)
    return jnp.stack([x, y, z, dx, dz, dy, zeros], axis=-1)


def np_box_3d_to_anchor(boxes_3d: np.ndarray, ortho_rotate: bool = False):
    """Host twin."""
    return np.asarray(box_3d_to_anchor(boxes_3d, ortho_rotate))
