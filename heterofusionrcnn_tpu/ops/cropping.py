"""Point-cloud RoI crop-and-sample.

TPU-native replacement for the reference's `cropping` CUDA library
(cropping/tf_cropping_g.cu + tf_cropping.cpp). Per proposal box: membership of
every point of that box's batch element is tested with the three dot-product
interval tests, the first `resize` member points (index order — deterministic,
unlike the CUDA atomic-append order) are gathered, and underfull boxes wrap
around their member list (j -> j % cnt), duplicating points to fill all
`resize` slots. Empty boxes yield index 0 and non_empty_box_mask=False.

Implementation note: features are gathered through flat global row indices
(box_ind * N + idx) — a per-box `fts[box_ind]` materializes an
(Nb, N, C) intermediate (7.5 GB at inference shapes) before slicing.

Like the reference (tf_cropping.py:36-52, gradient registration commented
out), gradients do NOT flow into the RPN features through the crop — the two
stages are trained separately; we enforce that with stop_gradient at the call
site rather than in this op.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from heterofusionrcnn_tpu.core.geometry import points_in_box_3d
from heterofusionrcnn_tpu.ops.dispatch import pallas_ok
from heterofusionrcnn_tpu.ops.grouping import _first_k_true
from heterofusionrcnn_tpu.ops.pallas_crop import crop_gather, crop_gather_fits


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
    b, n, _ = pts.shape
    nb = boxes_corners.shape[0]

    # Membership: each box against its batch element's points. Coordinates
    # only — (Nb, N, 3) is small.
    pts_per_box = pts[box_ind]  # (Nb, N, 3)
    inside = jax.vmap(points_in_box_3d)(pts_per_box, boxes_corners)  # (Nb, N)

    idx, cnt = _first_k_true(inside, resize)  # (Nb, R), (Nb,)

    # Wrap-fill: slot j beyond cnt duplicates member j % cnt (CUDA
    # duplication pattern, tf_cropping_g.cu).
    slot = jnp.arange(resize, dtype=jnp.int32)[None, :]
    wrapped = jnp.where(
        cnt[:, None] > 0, slot % jnp.maximum(cnt[:, None], 1), 0
    )
    if resize <= 1024 and n < 2**24:
        # Minor-axis take_along_axis lowers to a latency-bound scalar gather
        # (2.09 ms/iter in the round-5 fused-graph trace at (400,512)); a
        # one-hot MXU contraction is exact (idx < N < 2^24 in f32, one 1.0
        # per row) and measured 2.22 vs 3.72 ms standalone on v5e
        # (tools/microbench_wrapgather.py). O(R^2) work — gated to small R.
        one_hot = (wrapped[:, :, None] == jnp.arange(resize, dtype=jnp.int32)
                   ).astype(jnp.float32)  # (Nb, R, R)
        idx = jnp.einsum(
            "nrs,ns->nr", one_hot, idx.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)
    else:
        idx = jnp.take_along_axis(idx, wrapped, axis=1)  # (Nb, R)

    # Flat global row gathers: avoids materializing per-box copies of the
    # full feature tensor. The three narrow outputs (coords 3, intensity 1,
    # mask 1) ride ONE 5-wide gather: standalone 1-wide gathers lower to
    # latency-bound scalar gathers (~1.4-1.6 ms each at (400,512) in the
    # round-5 fused-graph trace vs ~1.1 ms for the packed row).
    rows = (box_ind[:, None] * n + idx).reshape(-1)  # (Nb*R,)
    pack_ok = (
        jnp.promote_types(pts.dtype, intensities.dtype) == pts.dtype
        and jnp.promote_types(pts.dtype, mask.dtype) == pts.dtype
    )
    if pack_ok:
        narrow = jnp.concatenate(
            [
                pts,
                intensities.astype(pts.dtype),
                mask.astype(pts.dtype)[..., None],
            ],
            axis=-1,
        ).reshape(b * n, 5)[rows].reshape(nb, resize, 5)
        crop_pts = narrow[..., :3]
        crop_int = narrow[..., 3:4].astype(intensities.dtype)
        crop_mask = narrow[..., 4].astype(mask.dtype)
    else:
        crop_pts = pts.reshape(b * n, 3)[rows].reshape(nb, resize, 3)
        crop_int = intensities.reshape(b * n, 1)[rows].reshape(nb, resize, 1)
        crop_mask = mask.reshape(b * n)[rows].reshape(nb, resize)
    c = fts.shape[-1]
    if (
        os.environ.get("HFR_PALLAS_CROP") == "1"
        and pallas_ok()
        and crop_gather_fits(n, c, resize, fts.dtype.itemsize, nb)
    ):
        # NEGATIVE RESULT, off by default (round 4, tools/microbench_crop.py
        # on v5e): the Pallas VMEM-resident row-gather kernel runs 10.5 ms
        # at the production shape vs XLA's flat-row gather at ~3 ms bf16 —
        # per-row scalar addressing + sublane dynamic_gather overhead
        # dominates; the XLA gather is the fast path.
        crop_fts = crop_gather(fts, idx, box_ind)
    else:
        crop_fts = fts.reshape(b * n, c)[rows].reshape(nb, resize, c)
    return crop_pts, crop_fts, crop_int, crop_mask, idx, cnt > 0
