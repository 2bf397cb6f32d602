"""Pallas TPU kernel: fused 3x3 stride-2 ConvTranspose + folded-BN affine +
ReLU (the VGG pyramid decoder's upconv blocks).

NEGATIVE RESULT — DO NOT ENABLE BY DEFAULT (round 3, v5e): exact and
oracle-tested but no faster than XLA e2e (see ops/pallas_conv.py docstring
and STATUS.md "Negative results"). Kept in-tree behind HFR_PALLAS_CONV=1.

Polyphase decomposition: flax's SAME-padded kernel-3 stride-2 transpose conv
maps output o = 2i + 2 - k (probed with a delta input), so the even output
phase takes taps k=2 at i and k=0 at i-1, and the odd phase a single tap
k=1 at i. In 2D that is four small convolutions at INPUT resolution with
4/2/2/1 taps — 9 MACs per input pixel total, identical to the forward conv,
all of them matmuls the MXU runs near peak (the XLA conv emitter's
per-pixel floor is why this kernel exists; see ops/pallas_conv.py).

The kernel writes the four phases as channel groups (B, H, W, 4*Cout);
`convtranspose3x3_affine_relu` then interleaves them to (B, 2H, 2W, Cout)
with one XLA reshape/transpose (a straight HBM copy). The affine + ReLU are
applied in-kernel so the only HBM traffic is input once, phases once.

Matches flax nn.ConvTranspose(kernel=(3,3), strides=(2,2), padding="SAME")
with HWIO kernels — equivalence is oracle-tested in interpret mode and
on-chip (tests/test_pallas_conv.py). Reference context: upconv blocks of
hf/core/feature_extractors/img_vgg_pyramid.py:104-165.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heterofusionrcnn_tpu.ops.pallas_conv import pick_conv_tiles

# Per-dimension tap rule: even phase <- (k=2, padded offset 1) and
# (k=0, padded offset 0); odd phase <- (k=1, padded offset 1). Offsets index
# the LOW-side-padded input (padded index i+1 holds original row i).
_TAPS = {0: ((2, 1), (0, 0)), 1: ((1, 1),)}


def _convt_kernel(
    x_ref,     # (1, TH+1, TW+1, Cin): low-side-padded window
    w_ref,     # (9*Cin, Cout) taps laid out (ky, kx, cin)
    s_ref,     # (1, Cout) f32 affine scale
    b_ref,     # (1, Cout) f32 affine shift
    out_ref,   # (1, TH, TW, 4*Cout) phase groups (ey*2+ex)
    *,
    th: int,
    tw: int,
    cin: int,
    cout: int,
    relu: bool,
):
    f32 = jnp.float32

    def wk(ky, kx):
        return w_ref[(ky * 3 + kx) * cin:(ky * 3 + kx + 1) * cin, :]

    def tap(dy, dx):
        return x_ref[0, dy:dy + th, dx:dx + tw, :].reshape(th * tw, cin)

    outs = []
    for ey in (0, 1):
        for ex in (0, 1):
            acc = jnp.zeros((th * tw, cout), f32)
            for ky, dy in _TAPS[ey]:
                for kx, dx in _TAPS[ex]:
                    acc = acc + jnp.dot(
                        tap(dy, dx), wk(ky, kx), preferred_element_type=f32
                    )
            o = acc * s_ref[0] + b_ref[0]
            if relu:
                o = jnp.maximum(o, 0.0)
            outs.append(o)
    out = jnp.concatenate(outs, axis=1)  # (TH*TW, 4*Cout)
    out_ref[0] = out.reshape(th, tw, 4 * cout).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "compute_dtype", "out_dtype", "interpret"),
)
def convtranspose3x3_affine_relu(
    x: jnp.ndarray,       # (B, H, W, Cin)
    w: jnp.ndarray,       # (3, 3, Cin, Cout) HWIO (flax ConvTranspose)
    scale: jnp.ndarray,   # (Cout,) folded-BN scale
    shift: jnp.ndarray,   # (Cout,) folded-BN shift
    *,
    relu: bool = True,
    compute_dtype=jnp.bfloat16,
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stride-2 SAME 3x3 transpose conv + affine + ReLU -> (B, 2H, 2W, Cout)."""
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    cd = compute_dtype
    out_dtype = out_dtype or cd
    th, tw = pick_conv_tiles(
        h, wd, cin, cout, jnp.dtype(cd).itemsize, im2col=False,
        halo=1, phases=4,
    )
    if th == 0:
        raise ValueError(f"no tile fits VMEM for H={h} W={wd} C={cin}->{cout}")

    # Halo of 1 on the low side only (even phases read input row/col i-1).
    xp = jnp.pad(x.astype(cd), ((0, 0), (1, 0), (1, 0), (0, 0)))
    wim = w.reshape(9 * cin, cout).astype(cd)

    kernel = functools.partial(
        _convt_kernel, th=th, tw=tw, cin=cin, cout=cout, relu=relu
    )
    from heterofusionrcnn_tpu.ops.pallas_conv import _VMEM_LIMIT

    phases = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(th + 1), pl.Element(wd + 1),
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
            (1, th, wd, 4 * cout), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, 4 * cout), out_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(
        xp, wim,
        scale.astype(jnp.float32)[None], shift.astype(jnp.float32)[None],
    )

    # Interleave phases: (B, H, W, ey, ex, C) -> (B, 2H, 2W, C).
    ph = phases.reshape(b, h, wd, 2, 2, cout)
    return ph.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * wd, cout)
