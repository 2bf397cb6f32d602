"""On-chip A/B of the per-point image-feature gather (rpn.py:207-210).

The round-5 fused-graph trace (tools/capture_trace.py) shows XLA lowers
`flat[rows]` on a (B*H*W, 32) bf16 map by first relayouting the whole 105 MB
map to channels-first with a chunked while loop (%while.19, 3.5 ms/iter —
13x off the 0.27 ms copy floor) and then gathering along lanes. Candidates:

  A. current       — flat[rows] on the (BHW, C) map (XLA picks the layout)
  B. eye-transpose — WE produce the (C, BHW) map with one dot_general
                     against eye(C) (the MXU transposes for free at memory
                     speed), then gather along lanes
  C. split-8       — four (BHW, 8) gathers (grouping.py's small-C take path)
  D. vmap-2d       — per-batch img[v, u] advanced indexing

All candidates are exactness-checked against numpy before timing.

Usage: python tools/microbench_imggather.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.microbench_crop import pipelined_ms  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    b, h, w, c, p = 4, 360, 1200, 32, 16384
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.standard_normal((b, h, w, c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    u = jnp.asarray(rng.integers(0, w, (b, p)), jnp.int32)
    v = jnp.asarray(rng.integers(0, h, (b, p)), jnp.int32)

    rows = (jnp.arange(b)[:, None] * (h * w) + v * w + u).reshape(-1)

    @jax.jit
    def cand_a(img_, rows_):
        flat = img_.reshape(b * h * w, c)
        return flat[rows_].reshape(b, p, c)

    @jax.jit
    def cand_b(img_, rows_):
        flat = img_.reshape(b * h * w, c)
        eye = jnp.eye(c, dtype=img_.dtype)
        # (C, BHW): contract both channel dims — the MXU emits the
        # transposed product directly, no relayout pass.
        flat_t = jax.lax.dot_general(
            eye, flat, (((1,), (1,)), ((), ()))
        )
        return jnp.take(flat_t, rows_, axis=1).T.reshape(b, p, c)

    @jax.jit
    def cand_c(img_, rows_):
        flat = img_.reshape(b * h * w, c)
        outs = [
            jnp.take(flat[:, i : i + 8], rows_, axis=0) for i in range(0, c, 8)
        ]
        return jnp.concatenate(outs, axis=-1).reshape(b, p, c)

    @jax.jit
    def cand_d(img_, v_, u_):
        return jax.vmap(lambda im, vv, uu: im[vv, uu])(img_, v_, u_)

    want = np.asarray(cand_a(img, rows), np.float32)
    for name, fn, args in [
        ("A current", cand_a, (img, rows)),
        ("B eye-transpose", cand_b, (img, rows)),
        ("C split-8", cand_c, (img, rows)),
        ("D vmap-2d", cand_d, (img, v, u)),
    ]:
        got = np.asarray(fn(*args), np.float32)
        ok = np.array_equal(got, want)
        ms = pipelined_ms(fn, args)
        print(f"{name:16s} {ms:7.2f} ms   exact={ok}", flush=True)


if __name__ == "__main__":
    main()
