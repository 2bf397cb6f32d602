"""Point-cloud RoI crop-and-sample.

TPU-native replacement for the reference's `cropping` CUDA library
(cropping/tf_cropping_g.cu + tf_cropping.cpp). Per proposal box: membership of
every point of that box's batch element is tested with the three dot-product
interval tests, the first `resize` member points (index order — deterministic,
unlike the CUDA atomic-append order) are gathered, and underfull boxes wrap
around their member list (j -> j % cnt), duplicating points to fill all
`resize` slots. Empty boxes yield index 0 and non_empty_box_mask=False.

Like the reference (tf_cropping.py:36-52, gradient registration commented
out), gradients do NOT flow into the RPN features through the crop — the two
stages are trained separately; we enforce that with stop_gradient at the call
site rather than in this op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from heterofusionrcnn_tpu.core.geometry import points_in_box_3d
from heterofusionrcnn_tpu.ops.grouping import _first_k_true


@functools.partial(jax.jit, static_argnames=("resize",))
def pc_crop_and_sample(
    pts: jnp.ndarray,
    fts: jnp.ndarray,
    intensities: jnp.ndarray,
    mask: jnp.ndarray,
    boxes_corners: jnp.ndarray,
    box_ind: jnp.ndarray,
    resize: int,
):
    """Crop a fixed number of points per oriented 3D box.

    Args:
      pts: (B, N, 3) points.
      fts: (B, N, C) per-point features.
      intensities: (B, N, 1).
      mask: (B, N) foreground mask (any float/bool per-point scalar).
      boxes_corners: (Nb, 8, 3) ordered box corners (box_8co).
      box_ind: (Nb,) int32 batch element of each box.
      resize: R, points per box.
    Returns:
      crop_pts (Nb, R, 3), crop_fts (Nb, R, C), crop_intensities (Nb, R, 1),
      crop_mask (Nb, R), crop_ind (Nb, R) int32 original point indices,
      non_empty_box_mask (Nb,) bool.
      (Same tuple as cropping/tf_cropping.cpp:14-57.)
    """
    def one_box(corners, bi):
        p = pts[bi]  # (N, 3)
        inside = points_in_box_3d(p, corners)  # (N,)
        idx, cnt = _first_k_true(inside, resize)  # (R,), ()
        # Wrap-fill: slot j beyond cnt duplicates member j % cnt.
        slot = jnp.arange(resize, dtype=jnp.int32)
        wrapped = jnp.where(
            cnt > 0, slot % jnp.maximum(cnt, 1), jnp.int32(0)
        )
        # _first_k_true already pads with the first hit; re-gather through the
        # wrapped slots to get the CUDA j%cnt duplication pattern.
        idx = idx[wrapped]
        return (
            p[idx],
            fts[bi][idx],
            intensities[bi][idx],
            mask[bi][idx],
            idx,
            cnt > 0,
        )

    return jax.vmap(one_box)(boxes_corners, box_ind)
