"""On-chip A/B of the crop wrap-fill gather (cropping.pc_crop_and_sample).

The round-5 fused-graph trace shows the (Nb, R) minor-axis
`take_along_axis(idx, wrapped, axis=1)` lowering to a latency-bound scalar
gather at 2.09 ms/iter (fusion.37, s32[204800]). Candidates, all returning
bit-identical s32:

  A current   — take_along_axis on the minor axis.
  B flat      — one flat 1-D gather over (Nb*R,) global slots.
  C widened   — broadcast idx to (Nb, R, 8) and take_along 8-wide rows
                (32 B per gathered row instead of 4 B), slice lane 0.
  D one-hot   — (Nb, R, R) f32 one-hot contraction on the MXU (idx values
                < 2^24 are exact in f32).

Production shape: Nb=400 boxes, R=512 crop slots, idx values < N=16384.
Run on the real chip; the winner gets wired into cropping.py behind the
usual on-chip gate.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_kernels import pipelined_ms  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    nb, r, n = 400, 512, 16384
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, size=(nb, r)).astype(np.int32))
    # Realistic wrap pattern: cnt in [0, R], slot j -> j % max(cnt, 1).
    cnt = rng.integers(0, r + 1, size=(nb,)).astype(np.int32)
    slot = np.arange(r, dtype=np.int32)[None, :]
    wrapped = np.where(cnt[:, None] > 0, slot % np.maximum(cnt[:, None], 1), 0)
    wrapped = jnp.asarray(wrapped.astype(np.int32))

    def a_current(idx, wrapped):
        return jnp.take_along_axis(idx, wrapped, axis=1)

    def b_flat(idx, wrapped):
        rows = (
            jnp.arange(nb, dtype=jnp.int32)[:, None] * r + wrapped
        ).reshape(-1)
        return idx.reshape(-1)[rows].reshape(nb, r)

    def c_widened(idx, wrapped):
        wide = jnp.broadcast_to(idx[:, :, None], (nb, r, 8))
        out = jnp.take_along_axis(wide, wrapped[:, :, None], axis=1)
        return out[..., 0]

    def d_onehot(idx, wrapped):
        oh = (wrapped[:, :, None] == jnp.arange(r, dtype=jnp.int32)).astype(
            jnp.float32
        )  # (Nb, R, R)
        out = jnp.einsum(
            "nrs,ns->nr",
            oh,
            idx.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        return out.astype(jnp.int32)

    want = np.take_along_axis(np.asarray(idx), np.asarray(wrapped), axis=1)
    for name, fn in [
        ("A current", a_current),
        ("B flat", b_flat),
        ("C widened", c_widened),
        ("D one-hot", d_onehot),
    ]:
        jf = jax.jit(fn)
        got = np.asarray(jf(idx, wrapped))
        ok = bool((got == want).all())
        ms = pipelined_ms(jf, (idx, wrapped), iters=16, warmup=2)
        print(f"{name:12s} {ms:8.3f} ms   exact={ok}", flush=True)


if __name__ == "__main__":
    main()
