"""On-chip A/B of the RoI crop feature gather: Pallas kernel vs XLA.

Production dispatch shape (ops/cropping.py at fused inference): src
(4, 16384, 544) bf16, idx (400, 512). Checks exactness first, then times
both lowering strategies pipelined (one trailing sync — see STATUS.md
measurement notes).

Usage: python tools/microbench_crop.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pipelined_ms(fn, args, iters=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(out.ravel()[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(outs[-1].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from heterofusionrcnn_tpu.ops.pallas_crop import crop_gather

    rng = np.random.default_rng(0)
    for name, b, n, c, nb, r, dtype in [
        ("prod bf16", 4, 16384, 544, 400, 512, jnp.bfloat16),
        ("prod f32", 4, 16384, 544, 400, 512, np.float32),
    ]:
        src = jnp.asarray(
            rng.standard_normal((b, n, c)).astype(np.float32)
        ).astype(dtype)
        idx = jnp.asarray(
            np.sort(rng.integers(0, n, (nb, r)), axis=1), jnp.int32
        )
        bind = jnp.asarray(np.repeat(np.arange(b), nb // b), jnp.int32)

        pallas_fn = jax.jit(crop_gather)

        @jax.jit
        def xla_fn(src_, idx_, bind_):
            rows = (bind_[:, None] * n + idx_).reshape(-1)
            return src_.reshape(b * n, c)[rows].reshape(nb, r, c)

        idx_unsorted = jnp.asarray(rng.integers(0, n, (nb, r)), jnp.int32)

        from heterofusionrcnn_tpu.ops.pallas_crop import crop_gather_fits

        if crop_gather_fits(n, c, r, jnp.dtype(dtype).itemsize, nb):
            got = pallas_fn(src, idx, bind)
            want = xla_fn(src, idx, bind)
            exact = bool(jnp.all(got == want))
            t_pallas = pipelined_ms(pallas_fn, (src, idx, bind))
        else:
            exact, t_pallas = "gated-off", float("nan")
        t_xla = pipelined_ms(xla_fn, (src, idx, bind))
        t_xla_u = pipelined_ms(xla_fn, (src, idx_unsorted, bind))
        print(
            f"{name}: exact={exact}  pallas {t_pallas:.2f} ms  "
            f"xla sorted {t_xla:.2f} ms  xla unsorted {t_xla_u:.2f} ms"
        )


if __name__ == "__main__":
    main()
