"""Pallas TPU kernel: RoI feature row-gather for pc_crop_and_sample.

NEGATIVE RESULT — DO NOT ENABLE BY DEFAULT (round 4, measured on v5e via
tools/microbench_crop.py): this kernel is exact and lowers cleanly, but at
the production shape (src (4, 16384, 544) bf16, idx (400, 512)) it runs
10.5 ms vs the XLA flat-row gather's ~3 ms (bf16; ~7 ms f32). The per-row
cost — one SMEM scalar load + one untiled slab load + one sublane
dynamic_gather + one iota-mask merge — is VPU/scalar-unit-bound and
dwarfs the HBM savings. ops/cropping.py dispatches here only under
HFR_PALLAS_CROP=1; it is kept in-tree as the documented recipe for legal
arbitrary-row gathers in Mosaic (see the lowering notes below).

The crop's heavy step gathers (Nb, R) arbitrary point rows out of the
(B, N, C) stage-1 feature map (inference scale: 400 x 512 rows of 544
channels = ~0.2 GB out).

This kernel exploits two structural facts:
  - boxes arrive grouped by batch element (`box_ind` is the repeat pattern
    [0]*Nb/B + [1]*Nb/B + ...), so a grid over boxes with the source block
    indexed by `box_ind[i]` re-reads each (N, C) block from HBM only B
    times total — Pallas skips the DMA when consecutive grid cells map to
    the same block;
  - the (N, C) block fits VMEM at inference scale (16384 x 544 bf16 =
    17.8 MB), so each gathered row is a VMEM-to-VMEM copy, not an HBM
    transaction.

Both `box_ind` AND the per-box row indices ride the scalar-prefetch channel
(SMEM): dynamic gather indices must be scalar loads — extracting a scalar
from a VMEM-resident vector at a traced position does not lower, and a
(1, R) idx BlockSpec violates Mosaic's (8, 128)-divisibility rule (this
exact combination crashed the round-3 bench, BENCH_r03.json).

Row extraction itself must respect Mosaic's sublane alignment: a dynamic
vector.load at an arbitrary (non-multiple-of-8) sublane start does not
lower either. The kernel therefore views the source as (N/8, 8, C) — the
slab load `src_ref[row // 8]` indexes an UNTILED leading dim (plain address
arithmetic, always legal), and the row within the slab is selected with
`jnp.take_along_axis(slab, row % 8, axis=0)`, which lowers to the native
`tpu.dynamic_gather` sublane shuffle. Eight selected rows merge into one
(8, C) sublane-aligned store via iota masks.

Reference context: this replaces the gather half of the reference's
cropping CUDA op (cropping/tf_cropping_g.cu:40-81) — membership/first-R/
wrap stay in XLA (ops/cropping.py), only the final feature gather
dispatches here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM plan: double-buffered (N, C) source + double-buffered (R, C) out.
# Leave slack under the 64 MB cap we request (v5e has 128 MB physical).
_VMEM_CAP = 64 * 1024 * 1024
# SMEM budget for the prefetched (Nb, R) idx + (Nb,) box_ind scalars.
# Production shape (400, 512) int32 = 800 KB: verified to compile and run
# on v5e (tools/check_kernels.py). Kept conservative below the point where
# Mosaic would refuse the allocation.
_SMEM_CAP = 1 * 1024 * 1024
_ROW_GROUP = 8  # gathered rows per unrolled store (one sublane tile)


def _crop_gather_kernel(box_ind_ref, idx_ref, src_ref, out_ref, *, resize):
    del box_ind_ref  # consumed by the BlockSpec index_map only
    i = pl.program_id(0)
    c = out_ref.shape[-1]
    sub = jax.lax.broadcasted_iota(jnp.int32, (_ROW_GROUP, c), 0)

    def body(g, carry):
        base = g * _ROW_GROUP
        acc = jnp.zeros((_ROW_GROUP, c), out_ref.dtype)
        for r in range(_ROW_GROUP):
            v = idx_ref[i, base + r]  # scalar load from SMEM
            slab = src_ref[v // _ROW_GROUP]  # (8, C): untiled leading index
            sel = jnp.take_along_axis(  # native sublane dynamic_gather
                slab, jnp.full((_ROW_GROUP, c), v % _ROW_GROUP, jnp.int32), 0
            )
            acc = jnp.where(sub == r, sel, acc)
        out_ref[pl.ds(base, _ROW_GROUP), :] = acc
        return carry

    jax.lax.fori_loop(0, resize // _ROW_GROUP, body, 0, unroll=False)


def crop_gather_fits(n: int, c: int, resize: int, itemsize: int, nb: int) -> bool:
    """True when the kernel can lower AND its memory plan fits.

    Encodes every constraint that would otherwise surface as a Mosaic
    compile error (the round-3 bench crash was a dispatch gate that checked
    VMEM only):
      - R must be a multiple of the unrolled row group;
      - tpu.dynamic_gather needs matching index/value bitwidths: 2-byte
        dtypes are only legal via the i32 lane-pair packing (requires even
        C), and 1-byte dtypes have no packing path at all;
      - double-buffered source + double-buffered out block under the VMEM
        cap (Pallas double-buffers outputs too);
      - prefetched idx + box_ind scalars under the SMEM budget (`nb` is
        required — the kernel always prefetches the full (Nb, R) table).
    Block shapes themselves are always legal here: the source block is the
    full (N, C) slab and the out block the full (R, C) slab — both "equal
    to the respective array dimensions" under Mosaic's block rule.
    """
    if nb <= 0:
        raise ValueError("crop_gather_fits: nb (number of boxes) must be > 0")
    if itemsize < 2 or (itemsize == 2 and c % 2 != 0):
        return False
    vmem_need = 2 * n * c * itemsize + 2 * resize * c * itemsize
    smem_need = (nb * resize + nb) * 4
    return (
        resize % _ROW_GROUP == 0
        and n % _ROW_GROUP == 0
        and vmem_need <= _VMEM_CAP - (2 << 20)
        and smem_need <= _SMEM_CAP
    )


def crop_gather(src, idx, box_ind, *, interpret: bool = False):
    """out[b, r, :] = src[box_ind[b], idx[b, r], :].

    Args:
      src: (B, N, C) feature rows (any dtype; bf16 at inference scale).
      idx: (Nb, R) int32 in-element point rows.
      box_ind: (Nb,) int32 batch element per box, grouped (non-decreasing)
        for DMA reuse; any order is still correct.
    Returns: (Nb, R, C) gathered rows.
    """
    b, n, c = src.shape
    nb, resize = idx.shape

    # tpu.dynamic_gather requires index/value bitwidths to match; 16-bit
    # values (bf16) are gathered as i32 lane-pairs — exact, since whole rows
    # move together (and it halves the lane work).
    if src.dtype.itemsize == 2 and c % 2 == 0 and not interpret:
        packed = jax.lax.bitcast_convert_type(
            src.reshape(b, n, c // 2, 2), jnp.int32
        )  # (B, N, C/2) i32
        out = crop_gather(packed, idx, box_ind, interpret=interpret)
        return jax.lax.bitcast_convert_type(out, src.dtype).reshape(
            nb, resize, c
        )

    kernel = functools.partial(_crop_gather_kernel, resize=resize)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (None, n // _ROW_GROUP, _ROW_GROUP, c),
                lambda i, box_ind_ref, idx_ref: (box_ind_ref[i], 0, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((None, resize, c), lambda i, *_: (i, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, resize, c), src.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=interpret,
    )(
        box_ind.astype(jnp.int32),
        idx.astype(jnp.int32),
        src.reshape(b, n // _ROW_GROUP, _ROW_GROUP, c),
    )
