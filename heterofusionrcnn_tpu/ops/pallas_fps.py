"""Pallas TPU kernel: farthest point sampling.

FPS is sequential in the number of selected points; the XLA fori_loop
version pays per-iteration dispatch/layout costs. Here the whole batch is
processed by ONE kernel instance: the (B, N) running min-distance state
lives in VMEM with the batch on the sublane axis, so every per-iteration
pass (distance update, per-row max, per-row argmax-by-masked-min, selected
coordinate extraction by masked reduction) is a full-width VPU op over all
batch elements at once. npoint sequential iterations total — not
B * npoint as with one kernel per batch element.

Small-batch fold: at B < 8 the sublane axis is mostly idle (native VPU
tiles are 8 sublanes), so each batch row is split into F chunks laid out
chunk-major on the sublane axis ((F*B, N/F) state). Per-chunk partial
reductions are combined across chunks with log2(F) sublane rotations
(pltpu.roll by B rows — the chunk group is cyclic), NOT reshapes: an
earlier (B*F, 1) <-> (B, F) in-loop reshape variant hung the Mosaic
compiler (STATUS.md round-2 negative result). Selection semantics are
unchanged — candidate ids compare by ORIGINAL index, and the cross-chunk
combine uses the same (max distance, then min index) rule, so outputs stay
bit-identical to the unfolded kernel.

Semantics identical to ops.sampling.farthest_point_sample (start at index 0,
ties -> lowest index; parity with sampling/tf_sampling_g.cu:105-170).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.4e38


def _fps_kernel(xs_ref, ys_ref, zs_ref, out_ref, dists_ref, *, npoint, n_f,
                bt, f):
    """xs/ys/zs_ref: (bt*F, N/F) chunk-major SoA coordinates (row c*bt + b
    holds batch b's candidates [c*N/F, (c+1)*N/F)); out_ref: (bt, npoint)
    int32; dists_ref: (bt*F, N/F) f32 scratch."""
    rows = bt * f
    xs = xs_ref[:, :]
    ys = ys_ref[:, :]
    zs = zs_ref[:, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, n_f), 1)
    chunk = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // bt
    global_id = chunk * n_f + col  # (rows, N/F) original candidate index

    def _combine(v, op):
        # All-reduce across the F chunks of each batch row: the rows of one
        # batch element form a cyclic group under roll-by-bt.
        s = bt
        while s < rows:
            v = op(v, pltpu.roll(v, s, 0))
            s *= 2
        return v

    dists_ref[:, :] = jnp.full((rows, n_f), _BIG, jnp.float32)

    def body(i, last_idx):  # last_idx: (rows, 1) int32, original index
        # Coordinates of each row's last selected point via masked reduction
        # (no dynamic scalar gathers); only the owning chunk contributes,
        # the rotation-max broadcasts it to the other chunks.
        sel = global_id == last_idx
        lx = jnp.max(jnp.where(sel, xs, -_BIG), axis=1, keepdims=True)
        ly = jnp.max(jnp.where(sel, ys, -_BIG), axis=1, keepdims=True)
        lz = jnp.max(jnp.where(sel, zs, -_BIG), axis=1, keepdims=True)
        if f > 1:
            lx = _combine(lx, jnp.maximum)
            ly = _combine(ly, jnp.maximum)
            lz = _combine(lz, jnp.maximum)

        dx = xs - lx
        dy = ys - ly
        dz = zs - lz
        d = dx * dx + dy * dy + dz * dz
        nd = jnp.minimum(dists_ref[:, :], d)
        dists_ref[:, :] = nd

        m = jnp.max(nd, axis=1, keepdims=True)  # (rows, 1) per-chunk max
        if f > 1:
            m = _combine(m, jnp.maximum)  # batch max, all rows
        nxt = jnp.min(
            jnp.where(nd == m, global_id, jnp.int32(2**30)),
            axis=1,
            keepdims=True,
        )
        if f > 1:
            nxt = _combine(nxt, jnp.minimum)  # lowest index across chunks

        # Chunk-0 rows are the bt batch rows in order. Mosaic only allows
        # dynamic lane offsets it can prove 128-aligned, so the write
        # touches just the 128-lane window containing column i (read-mask-
        # write) instead of a full (bt, npoint) masked rewrite; tiny
        # outputs fall back to the full-width form.
        if npoint >= 128 and npoint % 128 == 0:
            start = pl.multiple_of((i // 128) * 128, 128)
            wcol = jax.lax.broadcasted_iota(jnp.int32, (bt, 128), 1) + start
            out_ref[:, pl.ds(start, 128)] = jnp.where(
                wcol == i, last_idx[0:bt, :], out_ref[:, pl.ds(start, 128)]
            )
        else:
            ocol = jax.lax.broadcasted_iota(jnp.int32, (bt, npoint), 1)
            out_ref[:, :] = jnp.where(
                ocol == i, last_idx[0:bt, :], out_ref[:, :]
            )
        return nxt

    jax.lax.fori_loop(0, npoint, body, jnp.zeros((rows, 1), jnp.int32))


@functools.partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """FPS via the fused batched Pallas kernel.

    Args:
      xyz: (B, N, 3) points.
    Returns:
      (B, npoint) int32 indices.
    """
    b, n, _ = xyz.shape
    # Batch tile: 3 coord arrays + dist scratch + output must fit VMEM
    # (e.g. 1600 RoIs x 512 pts whole-batch blew the 16 MB scoped limit).
    bt = b
    for cand in range(b, 0, -1):
        if b % cand == 0 and 5 * cand * n * 4 <= 8_000_000:
            bt = cand
            break
    interpret = jax.default_backend() != "tpu"
    # Sublane fold: split each row into F chunks so bt*F fills the native
    # 8-sublane tile. pltpu.roll has no interpret-mode impl, so the folded
    # form is TPU-only (the unfolded form is the oracle there anyway).
    f = 1
    if not interpret:
        while (
            bt * f * 2 <= 8
            and n % (f * 2) == 0
            and (n // (f * 2)) % 128 == 0
        ):
            f *= 2
    n_f = n // f

    kernel = functools.partial(
        _fps_kernel, npoint=npoint, n_f=n_f, bt=bt, f=f
    )

    def fold(v):  # (B, N) -> ((B//bt)*F*bt, N/F) chunk-major per batch tile
        return (
            v.reshape(b // bt, bt, f, n_f)
            .swapaxes(1, 2)
            .reshape((b // bt) * f * bt, n_f)
        )

    xs = fold(xyz[..., 0])
    ys = fold(xyz[..., 1])
    zs = fold(xyz[..., 2])
    coord_spec = pl.BlockSpec(
        (f * bt, n_f), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(b // bt,),
        out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
        in_specs=[coord_spec, coord_spec, coord_spec],
        out_specs=pl.BlockSpec(
            (bt, npoint), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((f * bt, n_f), jnp.float32)],
    )(xs, ys, zs)
