"""Oracle tests for the fused Pallas image-conv kernels (ops/pallas_conv.py,
ops/pallas_convtranspose.py) and their ConvBNRelu/ConvTransposeBNRelu
dispatch: outputs must match the XLA conv path (which itself parity-tests
against the reference VGG) to f32 roundoff."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from heterofusionrcnn_tpu.ops.pallas_conv import conv3x3_affine_relu
from heterofusionrcnn_tpu.ops.pallas_convtranspose import (
    convtranspose3x3_affine_relu,
)


def _ref_conv(x, w, s, b, relu=True):
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = np.asarray(out) * s + b
    return np.maximum(out, 0) if relu else out


def test_conv3x3_kernel_matches_xla():
    rng = np.random.default_rng(0)
    for cin, cout in [(8, 16), (160, 32)]:  # im2col and shifted modes
        x = rng.standard_normal((2, 16, 24, cin)).astype(np.float32)
        w = rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.1
        s = rng.standard_normal(cout).astype(np.float32)
        b = rng.standard_normal(cout).astype(np.float32)
        got = conv3x3_affine_relu(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), jnp.asarray(b),
            relu=True, compute_dtype=jnp.float32, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), _ref_conv(x, w, s, b), rtol=2e-5, atol=2e-5
        )


def test_convtranspose3x3_kernel_matches_flax():
    rng = np.random.default_rng(1)
    cin, cout = 8, 16
    x = rng.standard_normal((2, 8, 12, cin)).astype(np.float32)
    w = rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.1
    s = rng.standard_normal(cout).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)
    ct = nn.ConvTranspose(cout, (3, 3), strides=(2, 2), padding="SAME",
                          use_bias=False)
    ref = ct.apply({"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x))
    ref = np.maximum(np.asarray(ref) * s + b, 0)
    got = convtranspose3x3_affine_relu(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), jnp.asarray(b),
        relu=True, compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-5)


def test_img_extractor_pallas_dispatch_matches_xla():
    """The full ImgVggPyr forward through the Pallas dispatch (interpret
    mode) must equal the XLA path with the same variables — this covers the
    BN fold, conv bias fold, and phase interleave end to end."""
    from heterofusionrcnn_tpu.configs.config import ImgVggPyrConfig
    from heterofusionrcnn_tpu.models.extractors.img_vgg_pyr import ImgVggPyr

    cfg = ImgVggPyrConfig(
        vgg_conv1=(2, 8), vgg_conv2=(2, 16), vgg_conv3=(3, 16),
        vgg_conv4=(3, 32), downsample=1,
    )
    model = ImgVggPyr(config=cfg)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 255, (1, 24, 40, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img, training=False)

    os.environ["HFR_PALLAS_CONV"] = "0"
    try:
        want = model.apply(variables, img, training=False)
    finally:
        del os.environ["HFR_PALLAS_CONV"]
    os.environ["HFR_PALLAS_CONV"] = "1"
    os.environ["HFR_PALLAS_CONV_INTERPRET"] = "1"
    try:
        got = model.apply(variables, img, training=False)
    finally:
        del os.environ["HFR_PALLAS_CONV"]
        del os.environ["HFR_PALLAS_CONV_INTERPRET"]
    # The folded-BN affine reorders the normalization arithmetic, so deep
    # accumulation drifts a few ulps (observed max ~7e-5 on ~1e2 values).
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
    )
