"""Pallas TPU kernel: fused 3x3 SAME conv + folded-BN affine + ReLU.

NEGATIVE RESULT — DO NOT ENABLE BY DEFAULT (round 3, v5e,
tools/microbench_conv.py): exact and oracle-tested, but ImgVggPyr e2e is
28.4 ms (XLA) vs 29.3 ms (this kernel) at batch 4 bf16 — the VGG cost is
intrinsic (HBM + per-op floors), not the XLA conv emitter. Kept in-tree
behind HFR_PALLAS_CONV=1 as the documented halo-read/im2col recipe; see
STATUS.md "Negative results".

Why this exists: the VGG image branch is the single largest block of the
fused two-stage budget (~27 ms/batch-4) and XLA's conv lowering on v5e runs
at <8% MFU with a cost that is measured to be invariant to channel width,
dtype, AND layout (STATUS.md round-2 negative results: polyphase/space-to-
depth rewrites, channel-width sweeps, and shifted-matmul forms all landed on
the same per-pixel floor). That floor is a property of the XLA conv
emitter, not the hardware: a 3x3 conv is nine shifted (H*W, Cin) @
(Cin, Cout) matmuls, and the MXU runs those near peak when fed from VMEM.

Formulation:
  - grid = (B, H/TH): each cell computes TH full-width output rows. Width
    is NOT tiled: Mosaic requires the last two block dims to be (8, 128)-
    divisible or full, and the input halo (TW+2) and output (TW) widths
    cannot both satisfy that unless the block is the full W.
  - The input is pre-padded by 1 in H and W (XLA pad, HBM->HBM, cheap) so
    every cell reads an overlapping (TH+2, W+2, Cin) window — delivered
    via `pl.Element` block dimensions (elementwise start offsets, the
    Pallas mechanism for halo reads; a spec with any Element dim must be
    all-Element).
  - In-kernel, narrow-Cin layers (< 128) concatenate the nine (dy, dx)
    shifted views into an im2col (TH*TW, 9*Cin) block and hit it with ONE
    (9*Cin, Cout) matmul (K-utilization: 9x32 -> 288 beats nine K=32
    passes); wide-Cin layers accumulate nine shifted matmuls directly
    (K >= 128 already saturates the MXU and the im2col block would be 9x
    the VMEM). Both are exact.
  - Inference BatchNorm (+ conv bias) is folded to a per-channel affine
    applied after the conv, then optional ReLU — the whole ConvBNRelu block
    in one kernel, so the (B, H, W, C) intermediate never round-trips HBM.

Used by models/extractors/layers.ConvBNRelu on TPU inference (the XLA conv
remains the training/autodiff path). Reference context: the VGG blocks of
hf/core/feature_extractors/img_vgg_pyramid.py:31-172 (plain 3x3 SAME convs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic's default scoped-VMEM window is 16 MB; v5e has far more physical
# VMEM, and full-width rows at 1200 px with lane-padded channels need the
# headroom (the pick budget leaves slack for Mosaic's own scratch).
_VMEM_LIMIT = 48 * 1024 * 1024
_VMEM_BUDGET = 32 * 1024 * 1024


def _pad128(c: int) -> int:
    """Lane-padded channel count (what VMEM actually stores)."""
    return -(-c // 128) * 128


def _divisors_desc(n: int, cap: int):
    return [d for d in range(min(n, cap), 0, -1) if n % d == 0]


def _conv_kernel(
    x_ref,        # (1, TH+2, TW+2, Cin) padded input window, compute dtype
    w_ref,        # (9*Cin, Cout) im2col-ordered weights (dy, dx, cin)
    s_ref,        # (1, Cout) f32 affine scale (folded BN)
    b_ref,        # (1, Cout) f32 affine shift (folded BN + conv bias)
    out_ref,      # (1, TH, TW, Cout)
    *,
    th: int,
    tw: int,
    cin: int,
    cout: int,
    relu: bool,
    im2col: bool,
):
    f32 = jnp.float32
    cd = w_ref.dtype

    # No (TH, TW) -> (TH*TW,) reshape anywhere: TW is a full image width
    # (not sublane-aligned), so merging those dims is a whole-buffer
    # relayout; rank-3 dot_general contracts the lane dim in place.
    def tap(dy, dx):
        return x_ref[0, dy:dy + th, dx:dx + tw, :]  # (TH, TW, Cin)

    def dot3(a, w2):
        return jax.lax.dot_general(
            a, w2, (((2,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (TH, TW, Cout')

    if im2col:
        a = jnp.concatenate(
            [tap(dy, dx) for dy in range(3) for dx in range(3)], axis=2
        )  # (TH, TW, 9*Cin)
        acc = dot3(a, w_ref[...])
    else:
        acc = jnp.zeros((th, tw, cout), f32)
        for dy in range(3):
            for dx in range(3):
                wk = w_ref[(dy * 3 + dx) * cin:(dy * 3 + dx + 1) * cin, :]
                acc = acc + dot3(tap(dy, dx), wk)
    out = acc * s_ref[0] + b_ref[0]
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0] = out.astype(out_ref.dtype)


def conv_tile_bytes(
    th: int, tw: int, cin: int, cout: int, elem: int, im2col: bool,
    halo: int = 2, phases: int = 1,
) -> int:
    """VMEM per grid cell: double-buffered in/out + f32 accumulator (+ the
    im2col block in im2col mode). Lane padding to 128 is what actually
    occupies VMEM. `phases` > 1 sizes the transpose-conv variant (its output
    carries `phases` channel groups)."""
    cin_p = _pad128(cin)
    cout_p = _pad128(cout)
    need = (
        2 * (th + halo) * (tw + halo) * cin_p * elem
        + phases * th * tw * cout_p * 4
        + 2 * phases * th * tw * cout_p * elem
        + 9 * cin_p * cout_p * elem  # weights (single-buffered, whole)
        # Mosaic materializes all nine shifted tap slices (measured: a
        # 128ch layer blew a 48 MB window the naive estimate put at 21 MB).
        + 9 * th * tw * cin_p * elem
    )
    if im2col:
        need += th * tw * _pad128(9 * cin) * elem
    return need


def pick_conv_tiles(
    h: int, w: int, cin: int, cout: int, elem: int, im2col: bool,
    halo: int = 2, phases: int = 1,
) -> tuple[int, int]:
    """Largest TH divisor of H whose full-width grid cell fits the VMEM
    budget (width is never tiled — see module docstring). (0, 0) if even
    TH=1 does not fit."""
    for th in _divisors_desc(h, 64):
        if conv_tile_bytes(th, w, cin, cout, elem, im2col, halo,
                           phases) <= _VMEM_BUDGET:
            return (th, w)
    return (0, 0)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "compute_dtype", "out_dtype", "interpret"),
)
def conv3x3_affine_relu(
    x: jnp.ndarray,       # (B, H, W, Cin)
    w: jnp.ndarray,       # (3, 3, Cin, Cout)
    scale: jnp.ndarray,   # (Cout,) folded-BN scale (f32)
    shift: jnp.ndarray,   # (Cout,) folded-BN shift (f32)
    *,
    relu: bool = True,
    compute_dtype=jnp.bfloat16,
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """3x3 SAME conv + per-channel affine + optional ReLU, one Pallas pass.

    Exact in the same sense as XLA's conv at the given compute dtype: the
    matmuls accumulate in f32 with `compute_dtype` inputs.
    """
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    import os

    cd = compute_dtype
    out_dtype = out_dtype or cd
    im2col = cin < 128 and not os.environ.get("HFR_CONV_NO_IM2COL")
    th, tw = pick_conv_tiles(
        h, wd, cin, cout, jnp.dtype(cd).itemsize, im2col
    )
    if th == 0:
        raise ValueError(f"no tile fits VMEM for H={h} W={wd} C={cin}->{cout}")

    xp = jnp.pad(x.astype(cd), ((0, 0), (1, 1), (1, 1), (0, 0)))
    wim = w.reshape(9 * cin, cout).astype(cd)

    kernel = functools.partial(
        _conv_kernel, th=th, tw=tw, cin=cin, cout=cout, relu=relu,
        im2col=im2col,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(th + 2), pl.Element(wd + 2),
                 pl.Element(cin)),
                lambda i, j: (i, j * th, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((9 * cin, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wd, cout), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cout), out_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(
        xp, wim,
        scale.astype(jnp.float32)[None], shift.astype(jnp.float32)[None],
    )
