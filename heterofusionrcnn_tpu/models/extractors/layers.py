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


class _PointwiseParams(nn.Module):
    """Param holder matching nn.Dense's variable layout ("kernel"/"bias")
    without its forward pass — SeparableConvOverK composes the kernel into
    the depthwise weight instead of applying it separately."""

    in_features: int
    features: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", glorot, (self.in_features, self.features))
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


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
        dm = self.depth_multiplier
        w = self.param("depthwise", glorot, (k, c, dm))
        # Pointwise kernel lives in a "Dense_0" child scope with the exact
        # (c*dm, features) layout flax Dense used in the factored form, so
        # param trees / checkpoints / reference-weight injection paths are
        # unchanged.
        wp, bias = _PointwiseParams(
            c * dm, self.features, use_bias=not self.use_bn, name="Dense_0"
        )()
        # Depthwise -> pointwise is a linear chain (no nonlinearity between:
        # tf separable_conv2d semantics, pointfly.py:384-412), so compose the
        # two weights in f32 — W[k,c,d] = sum_j Wd[k,c,j]*Wp[c*dm+j,d] — and
        # contract ONCE: (B,P,K*C) @ (K*C,D) is an MXU-shaped matmul and the
        # (B,P,C*dm) intermediate (1.1 GB at stage-2 layer-1 scale) never
        # touches HBM. The ledger shows every stage HBM-bound, so bytes
        # removed = time removed. Composition costs K*C*dm*D weight-FLOPs.
        w_composed = jnp.einsum(
            "kcj,cjd->kcd", w, wp.reshape(c, dm, self.features)
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            w_composed = w_composed.astype(self.dtype)
        out = jnp.einsum("bpkc,kcd->bpd", x, w_composed)
        if bias is not None:
            out = out + bias
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
