"""A/B microbench: neighborhood-gather strategies at RCNN stage-2 shapes.

The roofline ledger attributes ~700 of rcnn_stage2_pointcnn's 1017 GFLOP to
one-hot gather contractions (group_point's TPU path for N <= 1024). A flat
leading-axis row gather moves the same bytes as pure HBM traffic (~0.9 GB
for the L1 shape) with zero MXU work — this measures both on chip so the
dispatch threshold is data, not folklore.

Usage: python tools/microbench_gather.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, iters=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=())
    def onehot_gather(points, idx):
        b, p, s = idx.shape
        n = points.shape[1]
        oh = (idx[..., None] == jnp.arange(n, dtype=jnp.int32)).astype(
            points.dtype
        )
        return jnp.einsum(
            "bpsn,bnc->bpsc", oh, points, preferred_element_type=points.dtype
        )

    @jax.jit
    def flat_rows(points, idx):
        b, p, s = idx.shape
        n, c = points.shape[1], points.shape[2]
        flat = points.reshape(b * n, c)
        rows = (
            jnp.arange(b, dtype=jnp.int32)[:, None] * n
            + idx.reshape(b, p * s)
        ).reshape(-1)
        return flat[rows].reshape(b, p, s, c)

    @jax.jit
    def take_axis(points, idx):
        b, p, s = idx.shape
        c = points.shape[2]
        return jnp.take_along_axis(
            points[:, :, None, :],
            idx.reshape(b, p * s)[..., None, None].astype(jnp.int32),
            axis=1,
        ).reshape(b, p, s, c)

    rng = np.random.default_rng(0)
    # (name, B, N, C, P, S): stage-2 L1/L2 and the transposed fused-xconv
    # gather layout (B, K, P). Measured on v5e (2026-08):
    #   s2_L1: onehot 4.6 / flat_rows 21.8 / take_axis 25.9 ms
    #   s2_L2: onehot 4.0 / flat_rows  7.1 / take_axis  9.0 ms
    # -> one-hot wins every small-N RoI shape; group_point keeps the
    # one-hot dispatch for N <= 1024 and the fused XConv kernel gathers
    # in-kernel instead. Do NOT add an N=16384 one-hot row here: the
    # (4,16384,8,16384) one-hot is ~17 GB and wedges the chip for
    # tens of minutes.
    shapes = [
        ("s2_L1 (400RoI,512pt,544ch,K4)", 400, 512, 544, 512, 4),
        ("s2_L2 (400RoI,512pt,512ch,K8)", 400, 512, 512, 128, 8),
        ("s2_L1_T (gather K-major)", 400, 512, 544, 4, 512),
    ]
    for name, b, n, c, p, s in shapes:
        pts = jnp.asarray(
            rng.standard_normal((b, n, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, n, (b, p, s)).astype(np.int32))
        r = {}
        for label, fn in [
            ("onehot", onehot_gather),
            ("flat_rows", flat_rows),
            ("take_axis", take_axis),
        ]:
            try:
                r[label] = timeit(fn, (pts, idx))
            except Exception as exc:  # noqa: BLE001
                r[label] = f"ERR {str(exc)[:40]}"
        # Exactness check ON DEVICE — transferring the (B,P,S,C) outputs
        # through the tunnel takes tens of minutes; a scalar mismatch count
        # costs one 33 ms RTT.
        @jax.jit
        def mismatches(points, indices):
            a = onehot_gather(points, indices)
            b_ = flat_rows(points, indices)
            return jnp.sum((a != b_).astype(jnp.int32))

        exact = int(mismatches(pts, idx)) == 0
        print(name, {k: (round(v, 2) if isinstance(v, float) else v)
                     for k, v in r.items()}, "onehot==rows:", exact,
              flush=True)


if __name__ == "__main__":
    main()
