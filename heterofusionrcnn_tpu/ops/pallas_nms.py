"""Pallas TPU kernel: oriented (rotated BEV) greedy NMS.

Greedy NMS is sequential in the kept boxes. The XLA formulations pay
per-step costs that multiply badly (the blocked version's worst case is
N/64 rounds of (64, N) IoU tables). Here the whole state — SoA box corners,
scores, alive mask — lives in VMEM laid out as (8, N/8) tiles (full sublane
utilization), and each of the max_keep iterations is a handful of vector
passes: masked argmax, scalar corner extraction by masked reduction, a
one-box-vs-all rotated IoU (the same Green's-theorem line-integral as
core.rotated_iou), and mask updates. Exact greedy semantics, ties to the
lowest index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.4e38
_EPS = 1e-8
_ROWS = 8  # sublane tiling of the state


def _corners_soa(x1, z1, x2, z2, ry):
    """BEV corners, same convention as core.rotated_iou._bev_corners_soa.

    Works on any broadcastable operands (scalars or (8, N/8) tiles).
    Returns lists of 4 xs and 4 zs.
    """
    cx = 0.5 * (x1 + x2)
    cz = 0.5 * (z1 + z2)
    c = jnp.cos(ry)
    s = jnp.sin(ry)
    xs, zs = [], []
    for dx_sign, dz_sign in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
        dx = dx_sign * 0.5 * (x2 - x1)
        dz = dz_sign * 0.5 * (z2 - z1)
        xs.append(dx * c + dz * s + cx)
        zs.append(-dx * s + dz * c + cz)
    return xs, zs


def _edges_integral(ax, az, bx, bz, drop_same_dir_collinear):
    """Line-integral of A's edges clipped to B (broadcast over operands)."""
    total = 0.0
    for e in range(4):
        px, pz = ax[e], az[e]
        qx, qz = ax[(e + 1) % 4], az[(e + 1) % 4]
        t0 = jnp.zeros_like(px + bx[0])
        t1 = jnp.ones_like(t0)
        for h in range(4):
            hx0, hz0 = bx[h], bz[h]
            ex = bx[(h + 1) % 4] - hx0
            ez = bz[(h + 1) % 4] - hz0
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
            t1 = jnp.where(both_out, -1.0, t1)
        span = jnp.maximum(t1 - t0, 0.0)
        total = total + span * (px * qz - pz * qx)
    return total


def _nms_kernel(boxes_ref, scores_ref, valid_ref, out_idx_ref, *,
                max_keep, n, iou_thresh):
    """boxes_ref: (5*8, N/8) — coordinate r of original index j lives at
    row (r*8 + j // (N/8)), column (j % (N/8)); scores_ref / valid_ref:
    (8, N/8); out_idx_ref: (1, max_keep) int32, -1 padded."""
    cols = n // _ROWS
    # Original index of element (r, c) = r * cols + c (row-major reshape).
    col = (
        jax.lax.broadcasted_iota(jnp.int32, (_ROWS, cols), 0) * cols
        + jax.lax.broadcasted_iota(jnp.int32, (_ROWS, cols), 1)
    )
    out_col = jax.lax.broadcasted_iota(jnp.int32, (1, max_keep), 1)

    bx1 = boxes_ref[0:_ROWS, :]
    bz1 = boxes_ref[_ROWS : 2 * _ROWS, :]
    bx2 = boxes_ref[2 * _ROWS : 3 * _ROWS, :]
    bz2 = boxes_ref[3 * _ROWS : 4 * _ROWS, :]
    bry = boxes_ref[4 * _ROWS : 5 * _ROWS, :]
    areas = (bx2 - bx1) * (bz2 - bz1)
    all_xs, all_zs = _corners_soa(bx1, bz1, bx2, bz2, bry)

    out_idx_ref[0:1, :] = jnp.full((1, max_keep), -1, jnp.int32)

    def body(i, alive):
        masked = jnp.where(alive > 0, scores_ref[:, :], _NEG)
        m = jnp.max(masked)
        ok = m > _NEG
        best = jnp.min(jnp.where(masked == m, col, 2**30))

        sel = col == best

        def pick(v):
            return jnp.max(jnp.where(sel, v, _NEG))

        sx1 = pick(bx1)
        sz1 = pick(bz1)
        sx2 = pick(bx2)
        sz2 = pick(bz2)
        sry = pick(bry)
        s_area = (sx2 - sx1) * (sz2 - sz1)
        s_xs, s_zs = _corners_soa(sx1, sz1, sx2, sz2, sry)

        ov = _edges_integral(s_xs, s_zs, all_xs, all_zs, False)
        ov = ov + _edges_integral(all_xs, all_zs, s_xs, s_zs, True)
        ov = jnp.maximum(0.5 * ov, 0.0)
        iou = ov / jnp.maximum(s_area + areas - ov, _EPS)

        suppress = (iou > iou_thresh) | sel
        alive = jnp.where(ok & suppress, 0.0, alive)

        write = jnp.where(ok, best, -1)
        out_idx_ref[0:1, :] = jnp.where(
            out_col == i, write, out_idx_ref[0:1, :]
        )
        return alive

    jax.lax.fori_loop(0, max_keep, body, valid_ref[:, :])


@functools.partial(jax.jit, static_argnames=("max_keep", "iou_thresh"))
def oriented_nms_pallas(
    bev_boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float,
    max_keep: int,
    valid_mask: jnp.ndarray | None = None,
):
    """Single-box-per-iteration greedy NMS in one Pallas kernel.

    Args:
      bev_boxes: (N, 5); scores: (N,); valid_mask: optional (N,) bool.
    Returns:
      keep_idx (max_keep,) int32 (-1 padded, descending score),
      keep_valid (max_keep,) bool.
    """
    n_in = bev_boxes.shape[0]
    pad = (-n_in) % _ROWS
    if pad:
        bev_boxes = jnp.concatenate(
            [bev_boxes, jnp.zeros((pad, 5), bev_boxes.dtype)], axis=0
        )
        scores = jnp.concatenate([scores, jnp.full((pad,), _NEG)], axis=0)
        pad_valid = jnp.concatenate(
            [
                jnp.ones((n_in,), bool) if valid_mask is None else valid_mask,
                jnp.zeros((pad,), bool),
            ]
        )
        valid_mask = pad_valid
    n = n_in + pad
    cols = n // _ROWS

    # (5, N) -> (5*8, cols): coordinate r occupies rows [r*8, r*8+8).
    boxes_t = jnp.swapaxes(bev_boxes, 0, 1).reshape(5 * _ROWS, cols)
    scores_t = scores.reshape(_ROWS, cols)
    valid = (
        jnp.ones((_ROWS, cols), jnp.float32)
        if valid_mask is None
        else valid_mask.reshape(_ROWS, cols).astype(jnp.float32)
    )

    kernel = functools.partial(
        _nms_kernel, max_keep=max_keep, n=n, iou_thresh=float(iou_thresh)
    )
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((1, max_keep), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(boxes_t, scores_t, valid)
    keep_idx = out[0]
    return keep_idx, keep_idx >= 0
