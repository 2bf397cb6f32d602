"""Image RoI crop-and-resize (parity with tf.image.crop_and_resize as used
by the RCNN's image RoI pooling, hf/core/models/rcnn_model.py:494-501).

Bilinear sampling on a fixed crop grid; normalized boxes in [y1, x1, y2, x2]
order; grid endpoints at y1*(H-1) .. y2*(H-1) (TF corner-aligned convention);
out-of-image samples read 0 (TF extrapolation_value default).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("crop_size",))
def crop_and_resize(
    image: jnp.ndarray,
    boxes_yxyx_norm: jnp.ndarray,
    box_ind: jnp.ndarray,
    crop_size: int,
) -> jnp.ndarray:
    """
    Args:
      image: (B, H, W, C).
      boxes_yxyx_norm: (N, 4) normalized [y1, x1, y2, x2].
      box_ind: (N,) int32 batch index per box.
      crop_size: output spatial size (crop_size x crop_size).
    Returns:
      (N, crop_size, crop_size, C) crops.
    """
    b, h, w, c = image.shape
    n = boxes_yxyx_norm.shape[0]
    y1, x1, y2, x2 = (boxes_yxyx_norm[:, i] for i in range(4))

    if crop_size > 1:
        frac = jnp.arange(crop_size, dtype=jnp.float32) / (crop_size - 1)
    else:
        frac = jnp.full((1,), 0.5, jnp.float32)

    # Sample positions in source pixels (corner-aligned, TF convention).
    ys = (y1[:, None] + (y2 - y1)[:, None] * frac[None, :]) * (h - 1)  # (N, S)
    xs = (x1[:, None] + (x2 - x1)[:, None] * frac[None, :]) * (w - 1)

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0

    def gather(yi, xi):
        """(N, S) x (N, S) integer coords -> (N, S, S, C) pixels, 0 outside."""
        valid = (
            (yi[:, :, None] >= 0)
            & (yi[:, :, None] <= h - 1)
            & (xi[:, None, :] >= 0)
            & (xi[:, None, :] <= w - 1)
        )
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        pix = image[
            box_ind[:, None, None], yc[:, :, None], xc[:, None, :]
        ]  # (N, S, S, C)
        return pix * valid[..., None]

    p00 = gather(y0, x0)
    p01 = gather(y0, x0 + 1)
    p10 = gather(y0 + 1, x0)
    p11 = gather(y0 + 1, x0 + 1)

    wy_ = wy[:, :, None, None]
    wx_ = wx[:, None, :, None]
    top = p00 * (1 - wx_) + p01 * wx_
    bot = p10 * (1 - wx_) + p11 * wx_
    return top * (1 - wy_) + bot * wy_
