"""On-chip A/B: XLA conv lowering vs the fused Pallas conv kernels at the
exact VGG-pyramid shapes of the fused benchmark (batch 4, bf16).

Context: STATUS.md's round-2 negative results measured XLA's 3x3 conv cost
on v5e as invariant to channel width, dtype, and layout — a per-pixel
lowering floor. ops/pallas_conv.py exists to beat that floor with MXU
matmuls fed from VMEM; this tool quantifies it per layer and end-to-end
through ImgVggPyr (HFR_PALLAS_CONV=0/1).

    python tools/microbench_conv.py            # per-layer + extractor A/B
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from heterofusionrcnn_tpu.ops.pallas_conv import conv3x3_affine_relu
from heterofusionrcnn_tpu.ops.pallas_convtranspose import (
    convtranspose3x3_affine_relu,
)

B = int(os.environ.get("HFR_BENCH_BATCH", "4"))
H, W = 360, 1200
REPS = int(os.environ.get("HFR_CONV_REPS", "10"))


def _sync(x):
    float(jnp.asarray(x).ravel()[0])


def _time(fn, args, reps=REPS):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    _sync(outs[-1])
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} batch={B}", flush=True)

    # (name, H, W, Cin, Cout) — every conv layer of ImgVggPyr at batch B.
    layers = [
        ("conv1_1", H, W, 3, 32),
        ("conv1_2", H, W, 32, 32),
        ("conv2_1", H // 2, W // 2, 32, 64),
        ("conv2_2", H // 2, W // 2, 64, 64),
        ("conv3_1", H // 4, W // 4, 64, 128),
        ("conv3_3", H // 4, W // 4, 128, 128),
        ("conv4_1", H // 8, W // 8, 128, 256),
        ("conv4_3", H // 8, W // 8, 256, 256),
        ("fusion3", H // 4, W // 4, 256, 64),
        ("fusion2", H // 2, W // 2, 128, 32),
        ("fusion1", H, W, 64, 32),
    ]
    total_xla = total_pl = 0.0
    for name, h, w, cin, cout in layers:
        x = jax.device_put(
            jnp.asarray(rng.standard_normal((B, h, w, cin)), jnp.bfloat16)
        )
        wt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05,
                         jnp.bfloat16)
        s = jnp.ones((cout,), jnp.float32)
        b = jnp.zeros((cout,), jnp.float32)

        xla = jax.jit(
            lambda a, k: jax.nn.relu(
                jax.lax.conv_general_dilated(
                    a, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            )
        )
        t_x = _time(xla, (x, wt))
        t_p = _time(
            jax.jit(lambda a, k: conv3x3_affine_relu(a, k, s, b)), (x, wt)
        )
        # Exactness check, reduced ON DEVICE (the tunnel moves ~40 MB/s —
        # never transfer full maps).
        @jax.jit
        def _maxerr(a, k):
            ref = xla(a, k).astype(jnp.float32)
            got = conv3x3_affine_relu(a, k, s, b).astype(jnp.float32)
            return jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-6)

        err = float(_maxerr(x, wt))
        total_xla += t_x
        total_pl += t_p
        print(f"{name:10s} ({h}x{w} {cin:3d}->{cout:3d}): "
              f"XLA {t_x:6.2f} ms | pallas {t_p:6.2f} ms | "
              f"{t_x / max(t_p, 1e-6):4.1f}x | relerr {err:.1e}", flush=True)

    # Transpose convs (decoder upconvs).
    for name, h, w, cin, cout in [
        ("upconv3", H // 8, W // 8, 256, 128),
        ("upconv2", H // 4, W // 4, 64, 64),
        ("upconv1", H // 2, W // 2, 32, 32),
    ]:
        import flax.linen as nn

        x = jax.device_put(
            jnp.asarray(rng.standard_normal((B, h, w, cin)), jnp.bfloat16)
        )
        wt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05,
                         jnp.bfloat16)
        s = jnp.ones((cout,), jnp.float32)
        b = jnp.zeros((cout,), jnp.float32)
        ct = nn.ConvTranspose(cout, (3, 3), strides=(2, 2), padding="SAME",
                              use_bias=False, dtype=jnp.bfloat16)
        xla = jax.jit(
            lambda a, k: jax.nn.relu(ct.apply({"params": {"kernel": k}}, a))
        )
        t_x = _time(xla, (x, wt))
        t_p = _time(
            jax.jit(lambda a, k: convtranspose3x3_affine_relu(a, k, s, b)),
            (x, wt),
        )
        total_xla += t_x
        total_pl += t_p
        print(f"{name:10s} ({h}x{w} {cin:3d}->{cout:3d}): "
              f"XLA {t_x:6.2f} ms | pallas {t_p:6.2f} ms | "
              f"{t_x / max(t_p, 1e-6):4.1f}x", flush=True)

    print(f"TOTAL: XLA {total_xla:.1f} ms | pallas {total_pl:.1f} ms",
          flush=True)

    # Whole-extractor A/B through the dispatch.
    from heterofusionrcnn_tpu.configs.config import ImgVggPyrConfig
    from heterofusionrcnn_tpu.models.extractors.img_vgg_pyr import ImgVggPyr

    cfg = ImgVggPyrConfig()
    model = ImgVggPyr(config=cfg, dtype=jnp.bfloat16)
    img = jax.device_put(
        jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)), jnp.float32)
    )
    variables = jax.jit(
        lambda r, a: model.init(r, a, training=False)
    )(jax.random.PRNGKey(0), img[:1])
    for flag in ("0", "1"):
        os.environ["HFR_PALLAS_CONV"] = flag
        f = jax.jit(lambda v, a: model.apply(v, a, training=False))
        t = _time(f, (variables, img))
        print(f"ImgVggPyr e2e (HFR_PALLAS_CONV={flag}): {t:.2f} ms",
              flush=True)
    del os.environ["HFR_PALLAS_CONV"]


if __name__ == "__main__":
    main()
