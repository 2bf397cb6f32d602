"""Shared NN building blocks (parity with hf/core/pointfly.py:371-497 and
hf/core/feature_extractors/tf_util.py).

The pointfly convention is linear -> activation -> batch-norm (momentum 0.99,
epsilon 1e-3 — the tf.layers.batch_normalization defaults the reference
inherits — glorot-normal weights, no bias when BN is on). The reference's (1, K) "convs"
over the neighbor axis are expressed here as dense contractions — identical
math, and XLA maps them straight onto the MXU instead of going through a conv
lowering.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

glorot = nn.initializers.glorot_normal()


class DenseBN(nn.Module):
    """pointfly.dense: Dense -> ELU -> BN (reference pointfly.py:474-497).

    `dtype` is the computation dtype (params stay float32) — set bfloat16
    for mixed-precision serving/training."""

    features: int
    use_bn: bool = True
    activation: Optional[Callable] = nn.elu
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, training: bool):
        x = nn.Dense(
            self.features,
            use_bias=not self.use_bn,
            kernel_init=glorot,
            dtype=self.dtype,
        )(x)
        if self.activation is not None:
            x = self.activation(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not training, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype,
            )(x)
        return x


class ConvOverK(nn.Module):
    """pointfly.conv2d with kernel (1, K) VALID (pointfly.py:431-460): a full
    contraction over the neighbor axis and input channels.

    Input (B, P, K, C_in) -> output (B, P, features).
    """

    features: int
    use_bn: bool = True
    activation: Optional[Callable] = nn.elu
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, training: bool):
        b, p, k, c = x.shape
        x = x.reshape(b, p, k * c)
        return DenseBN(self.features, self.use_bn, self.activation, self.dtype)(
            x, training
        )


class DepthwiseConvOverK(nn.Module):
    """pointfly.depthwise_conv2d with kernel (1, K) (pointfly.py:415-443):
    per-input-channel K-tap filters with a depth multiplier.

    Input (B, P, K, C) -> output (B, P, C * depth_multiplier).
    """

    depth_multiplier: int
    use_bn: bool = True
    activation: Optional[Callable] = nn.elu
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, training: bool):
        b, p, k, c = x.shape
        w = self.param("depthwise", glorot, (k, c, self.depth_multiplier))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            w = w.astype(self.dtype)
        out = jnp.einsum("bpkc,kcj->bpcj", x, w)
        out = out.reshape(b, p, c * self.depth_multiplier)
        if self.activation is not None:
            out = self.activation(out)
        if self.use_bn:
            out = nn.BatchNorm(
                use_running_average=not training, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype,
            )(out)
        return out


class SeparableConvOverK(nn.Module):
    """pointfly.separable_conv2d with kernel (1, K) (pointfly.py:384-412):
    depthwise over the neighbor axis (depth_multiplier filters per channel)
    then a pointwise projection, ELU + BN applied at the end.

    Input (B, P, K, C_in) -> output (B, P, features).
    """

    features: int
    depth_multiplier: int = 1
    use_bn: bool = True
    activation: Optional[Callable] = nn.elu
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, training: bool):
        b, p, k, c = x.shape
        w = self.param("depthwise", glorot, (k, c, self.depth_multiplier))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            w = w.astype(self.dtype)
        mid = jnp.einsum("bpkc,kcj->bpcj", x, w).reshape(
            b, p, c * self.depth_multiplier
        )
        out = nn.Dense(
            self.features,
            use_bias=not self.use_bn,
            kernel_init=glorot,
            dtype=self.dtype,
        )(mid)
        if self.activation is not None:
            out = self.activation(out)
        if self.use_bn:
            out = nn.BatchNorm(
                use_running_average=not training, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype,
            )(out)
        return out


class ConvBNRelu(nn.Module):
    """slim.conv2d + batch_norm + ReLU, SAME padding (the image-branch
    convention, img_vgg_pyramid.py:13-29)."""

    features: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, training: bool):
        x = nn.Conv(
            self.features, self.kernel, self.strides, padding="SAME",
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
                use_running_average=not training, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype,
            )(x)
        return nn.relu(x)


class ConvTransposeBNRelu(nn.Module):
    """slim.conv2d_transpose + batch_norm + ReLU, stride 2."""

    features: int
    kernel: tuple = (3, 3)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, training: bool):
        x = nn.ConvTranspose(
            self.features, self.kernel, (2, 2), padding="SAME", dtype=self.dtype
        )(x)
        x = nn.BatchNorm(
                use_running_average=not training, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype,
            )(x)
        return nn.relu(x)
