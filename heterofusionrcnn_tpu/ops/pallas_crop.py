"""Pallas TPU kernel: RoI feature row-gather for pc_crop_and_sample.

The crop's heavy step gathers (Nb, R) arbitrary point rows out of the
(B, N, C) stage-1 feature map (inference scale: 400 x 512 rows of 544
channels = ~0.2 GB out). XLA lowers this flat-row gather at ~40 GB/s
effective (tools/microbench_gather.py), ~9 ms — 8% of the fused budget.

This kernel exploits two structural facts:
  - boxes arrive grouped by batch element (`box_ind` is the repeat pattern
    [0]*Nb/B + [1]*Nb/B + ...), so a grid over boxes with the source block
    indexed by `box_ind[i]` re-reads each (N, C) block from HBM only B
    times total — Pallas skips the DMA when consecutive grid cells map to
    the same block;
  - the (N, C) block fits VMEM at inference scale (16384 x 544 bf16 =
    17.8 MB), so each gathered row is a VMEM-to-VMEM copy, not an HBM
    transaction.

`box_ind` rides the scalar-prefetch channel (the source BlockSpec's
index_map reads it); the per-box row indices are a normal blocked input.

Reference context: this replaces the gather half of the reference's
cropping CUDA op (cropping/tf_cropping_g.cu) — membership/first-R/wrap
stay in XLA (ops/cropping.py), only the final feature gather dispatches
here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM plan: double-buffered (N, C) source + (R, C) out + idx. Leave slack
# under the 64 MB cap we request (v5e has 128 MB physical).
_VMEM_CAP = 64 * 1024 * 1024
_ROW_GROUP = 8  # gathered rows per unrolled store (one sublane tile)


def _crop_gather_kernel(box_ind_ref, idx_ref, src_ref, out_ref, *, resize):
    del box_ind_ref  # consumed by the BlockSpec index_map only
    idx = idx_ref[0]  # (R,) int32 rows into the (N, C) block

    def body(g, _):
        # Gather _ROW_GROUP rows, stack on sublanes, one store.
        rows = [
            src_ref[idx[g * _ROW_GROUP + r], :][None]
            for r in range(_ROW_GROUP)
        ]
        out_ref[pl.ds(g * _ROW_GROUP, _ROW_GROUP), :] = jnp.concatenate(
            rows, axis=0
        )
        return _

    jax.lax.fori_loop(0, resize // _ROW_GROUP, body, 0, unroll=False)


def crop_gather_fits(n: int, c: int, resize: int, itemsize: int) -> bool:
    """True when the kernel's VMEM plan fits (+ R a multiple of the group)."""
    need = 2 * n * c * itemsize + resize * c * itemsize + resize * 4 * 2
    return resize % _ROW_GROUP == 0 and need <= _VMEM_CAP - (1 << 20)


def crop_gather(src, idx, box_ind, *, interpret: bool = False):
    """out[b, r, :] = src[box_ind[b], idx[b, r], :].

    Args:
      src: (B, N, C) feature rows (any dtype; bf16 at inference scale).
      idx: (Nb, R) int32 in-element point rows.
      box_ind: (Nb,) int32 batch element per box, grouped (non-decreasing).
    Returns: (Nb, R, C) gathered rows.
    """
    b, n, c = src.shape
    nb, resize = idx.shape
    kernel = functools.partial(_crop_gather_kernel, resize=resize)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, resize), lambda i, box_ind_ref: (i, 0)),
            pl.BlockSpec(
                (None, n, c), lambda i, box_ind_ref: (box_ind_ref[i], 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec((None, resize, c), lambda i, _: (i, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, resize, c), src.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=interpret,
    )(box_ind.astype(jnp.int32), idx.astype(jnp.int32), src)
