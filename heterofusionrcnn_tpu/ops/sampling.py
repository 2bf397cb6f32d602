"""Point sampling ops: farthest-point sampling, gather, multinomial sample.

TPU-native replacement for the reference's `sampling` CUDA library
(sampling/tf_sampling_g.cu). FPS is inherently sequential in the number of
*selected* points; the TPU formulation keeps the (B, N) running min-distance
state in registers/VMEM across a `lax.fori_loop` of npoint steps — each step
is one vectorized distance update + argmax over N lanes, which the VPU eats.

All shapes static; deterministic (ties -> lowest index), which the CUDA
version's tree reduction only mostly guarantees.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from heterofusionrcnn_tpu.ops.dispatch import pallas_ok


@functools.partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Iterative max-min farthest point sampling.

    Parity: sampling/tf_sampling_g.cu:105-170 — selection starts at index 0;
    each iteration picks the point maximizing the min squared distance to the
    selected set.

    Dispatches to the Pallas kernel on TPU (distance state held in VMEM,
    ~2.4x); identical indices either way.

    Args:
      xyz: (B, N, 3) points.
    Returns:
      (B, npoint) int32 indices.
    """
    b, n, _ = xyz.shape

    if pallas_ok() and n % 128 == 0:
        from heterofusionrcnn_tpu.ops.pallas_fps import (
            farthest_point_sample_pallas,
        )

        return farthest_point_sample_pallas(xyz, npoint)

    def one_batch(pts):  # (N, 3)
        def body(i, state):
            dists, last_idx, out = state
            last = pts[last_idx]  # (3,)
            d = jnp.sum(jnp.square(pts - last[None, :]), axis=-1)  # (N,)
            dists = jnp.minimum(dists, d)
            nxt = jnp.argmax(dists).astype(jnp.int32)
            out = out.at[i].set(last_idx)
            return dists, nxt, out

        init = (
            jnp.full((n,), jnp.inf, jnp.float32),
            jnp.int32(0),
            jnp.zeros((npoint,), jnp.int32),
        )
        _, _, out = jax.lax.fori_loop(0, npoint, body, init)
        return out

    return jax.vmap(one_batch)(xyz)


def gather_point(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched gather (sampling/tf_sampling.py gather_point): (B, N, C) x
    (B, M) -> (B, M, C). Differentiable through XLA's native gather.

    Flat leading-axis row form — measured faster than take_along_axis on
    v5e for both narrow and wide rows (see group_point)."""
    b, n, c = points.shape
    m = idx.shape[1]
    flat = points.reshape(b * n, c)
    rows = (jnp.arange(b, dtype=jnp.int32)[:, None] * n + idx).reshape(-1)
    out = jnp.take(flat, rows, axis=0) if c <= 8 else flat[rows]
    return out.reshape(b, m, c)


def inverse_density_sampling(
    rng_key, points: jnp.ndarray, k: int, sample_num: int
) -> jnp.ndarray:
    """Inverse-density point sampling (pointfly.inverse_density_sampling
    :355-368): sampling probability proportional to the mean distance to the
    k nearest neighbors, without replacement (Gumbel top-k instead of the
    reference's tf.py_func np.random.choice).

    Args:
      rng_key: jax PRNG key.
      points: (B, N, 3).
    Returns:
      (B, sample_num) int32 indices.
    """
    from heterofusionrcnn_tpu.ops.grouping import knn_point

    d, _ = knn_point(k, points, points)  # (B, N, k), squared, ascending
    avg = jnp.abs(jnp.mean(d, axis=-1)) + 1e-8  # (B, N)
    logp = jnp.log(avg / jnp.sum(avg, axis=-1, keepdims=True))
    gumbel = -jnp.log(
        -jnp.log(jax.random.uniform(rng_key, logp.shape) + 1e-20) + 1e-20
    )
    _, idx = jax.lax.top_k(logp + gumbel, sample_num)
    return idx.astype(jnp.int32)


def prob_sample(cdf: jnp.ndarray, uniforms: jnp.ndarray) -> jnp.ndarray:
    """Inverse-CDF multinomial sampling (sampling/tf_sampling_g.cu:7-103).

    Args:
      cdf: (B, N) inclusive cumulative probabilities (last entry ~1).
      uniforms: (B, M) uniform samples in [0, 1).
    Returns:
      (B, M) int32 sampled indices.
    """
    def one(c, u):
        return jnp.searchsorted(c, u, side="left").astype(jnp.int32)

    return jax.vmap(one)(cdf, uniforms)
