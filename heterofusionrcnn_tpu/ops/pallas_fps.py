"""Pallas TPU kernel: farthest point sampling.

FPS is sequential in the number of selected points; the XLA fori_loop
version pays per-iteration dispatch/layout costs. Here the whole batch is
processed by ONE kernel instance: the (B, N) running min-distance state
lives in VMEM with the batch on the sublane axis, so every per-iteration
pass (distance update, per-row max, per-row argmax-by-masked-min, selected
coordinate extraction by masked reduction) is a full-width VPU op over all
batch elements at once. npoint sequential iterations total — not
B * npoint as with one kernel per batch element.

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


def _fps_kernel(xs_ref, ys_ref, zs_ref, out_ref, dists_ref, *, npoint, n, b):
    """xs/ys/zs_ref: (B, N) SoA coordinates; out_ref: (B, npoint) int32;
    dists_ref: (B, N) f32 scratch. All per-row (per-batch) operations."""
    xs = xs_ref[:, :]
    ys = ys_ref[:, :]
    zs = zs_ref[:, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (b, npoint), 1)

    dists_ref[:, :] = jnp.full((b, n), _BIG, jnp.float32)
    out_ref[:, :] = jnp.zeros((b, npoint), jnp.int32)

    def body(i, last_idx):  # last_idx: (B, 1) int32
        # Coordinates of each row's last selected point via masked reduction
        # (no dynamic scalar gathers).
        sel = col == last_idx
        lx = jnp.max(jnp.where(sel, xs, -_BIG), axis=1, keepdims=True)
        ly = jnp.max(jnp.where(sel, ys, -_BIG), axis=1, keepdims=True)
        lz = jnp.max(jnp.where(sel, zs, -_BIG), axis=1, keepdims=True)

        dx = xs - lx
        dy = ys - ly
        dz = zs - lz
        d = dx * dx + dy * dy + dz * dz
        nd = jnp.minimum(dists_ref[:, :], d)
        dists_ref[:, :] = nd

        m = jnp.max(nd, axis=1, keepdims=True)  # (B, 1)
        nxt = jnp.min(
            jnp.where(nd == m, col, jnp.int32(2**30)), axis=1, keepdims=True
        )

        out_ref[:, :] = jnp.where(out_col == i, last_idx, out_ref[:, :])
        return nxt

    jax.lax.fori_loop(0, npoint, body, jnp.zeros((b, 1), jnp.int32))


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
    kernel = functools.partial(_fps_kernel, npoint=npoint, n=n, b=bt)
    interpret = jax.default_backend() != "tpu"

    xs = xyz[..., 0]
    ys = xyz[..., 1]
    zs = xyz[..., 2]
    coord_spec = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(b // bt,),
        out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
        in_specs=[coord_spec, coord_spec, coord_spec],
        out_specs=pl.BlockSpec(
            (bt, npoint), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bt, n), jnp.float32)],
    )(xs, ys, zs)
