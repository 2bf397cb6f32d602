"""Pallas TPU kernel: farthest point sampling.

FPS is sequential in the number of selected points; the XLA fori_loop
version pays per-iteration dispatch/layout costs. Here the (1, N) running
min-distance state and the SoA point coordinates live in VMEM for the whole
kernel; each iteration is a handful of vector passes (distance update, max,
argmax-by-masked-min, coordinate extraction by masked sum) over N lanes.

Semantics identical to ops.sampling.farthest_point_sample (start at index 0,
ties -> lowest index).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _fps_kernel(pts_ref, out_ref, dists_ref, *, npoint, n):
    """pts_ref: (3, N) SoA points; out_ref: (1, npoint) int32 indices;
    dists_ref: (1, N) f32 scratch."""
    xs = pts_ref[0:1, :]  # (1, N)
    ys = pts_ref[1:2, :]
    zs = pts_ref[2:3, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (1, npoint), 1)

    dists_ref[:, :] = jnp.full((1, n), 3.4e38, jnp.float32)
    out_ref[0:1, :] = jnp.zeros((1, npoint), jnp.int32)

    def body(i, last_idx):
        # Coordinates of the last selected point via masked reduction
        # (no dynamic scalar gather needed).
        sel = col == last_idx
        lx = jnp.max(jnp.where(sel, xs, -3.4e38))
        ly = jnp.max(jnp.where(sel, ys, -3.4e38))
        lz = jnp.max(jnp.where(sel, zs, -3.4e38))

        dx = xs - lx
        dy = ys - ly
        dz = zs - lz
        d = dx * dx + dy * dy + dz * dz
        nd = jnp.minimum(dists_ref[:, :], d)
        dists_ref[:, :] = nd

        m = jnp.max(nd)
        nxt = jnp.min(jnp.where(nd == m, col, 2**30))

        # Scalar VMEM stores are unsupported: masked row write instead.
        out_ref[0:1, :] = jnp.where(out_col == i, last_idx, out_ref[0:1, :])
        return nxt

    jax.lax.fori_loop(0, npoint, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """FPS via the fused Pallas kernel.

    Args:
      xyz: (B, N, 3) points.
    Returns:
      (B, npoint) int32 indices.
    """
    b, n, _ = xyz.shape
    kernel = functools.partial(_fps_kernel, npoint=npoint, n=n)
    interpret = jax.default_backend() != "tpu"

    def one_batch(pts_t):
        return pl.pallas_call(
            kernel,
            interpret=interpret,
            out_shape=jax.ShapeDtypeStruct((1, npoint), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, n), jnp.float32)],
        )(pts_t)

    xyz_t = jnp.swapaxes(xyz, 1, 2)  # (B, 3, N)
    return jax.vmap(one_batch)(xyz_t).squeeze(1)
