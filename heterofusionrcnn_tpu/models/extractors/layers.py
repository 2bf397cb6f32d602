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


def _conv3x3_shifted_matmul(x, w, b, compute_dtype):
    """EXACT 3x3 stride-1 SAME conv as 9 shifted (B*H*W, Cin)@(Cin, Cout)
    matmuls with one f32 accumulator.

    NEGATIVE RESULT at the XLA level (kept as an A/B knob + building block
    for a Pallas conv): measured e2e on v5e this rewrite REGRESSED the
    fused bench 34.9 -> 30.2 fps (+22 GB HBM/batch) — XLA materializes the
    shifted copies and f32 partials instead of fusing the 9-tap chain, so
    the traffic swamps the MXU win. The standalone observation stands (a
    same-FLOPs matmul is ~3x faster than XLA's conv at these shapes), which
    means the win needs a Pallas kernel holding the accumulator in VMEM,
    not an XLA-level rewrite. Each kernel tap is a pure channel-mixing
    matmul of the shifted input — identical math to the conv.

    Args:
      x: (B, H, W, Cin); w: (3, 3, Cin, Cout); b: (Cout,) or None.
    """
    bsz, h, wd, cin = x.shape
    cd = compute_dtype or x.dtype
    xp = jnp.pad(x.astype(cd), ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            patch = xp[:, dy:dy + h, dx:dx + wd, :]
            part = jnp.einsum(
                "bhwc,cd->bhwd",
                patch,
                w[dy, dx].astype(cd),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    if b is not None:
        acc = acc + b.astype(jnp.float32)
    return acc.astype(cd)


class ConvBNRelu(nn.Module):
    """slim.conv2d + batch_norm + ReLU, SAME padding (the image-branch
    convention, img_vgg_pyramid.py:13-29).

    HFR_CONV_MATMUL=1 routes 3x3 stride-1 convs through
    `_conv3x3_shifted_matmul` (A/B knob — regresses e2e at the XLA level,
    see that function's docstring); param tree is identical either way
    (the nn.Conv module owns the weights)."""

    features: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, training: bool):
        import os

        conv = nn.Conv(
            self.features, self.kernel, self.strides, padding="SAME",
            dtype=self.dtype, name="Conv_0",
        )
        bn = nn.BatchNorm(
            use_running_average=not training, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name="BatchNorm_0",
        )
        mode = _pallas_conv_mode(
            training, self.kernel == (3, 3) and self.strides == (1, 1),
            x.shape, self.features, self.dtype,
        )
        if mode:
            # Inference: the whole conv+BN+ReLU block runs as ONE Pallas
            # kernel (ops/pallas_conv.py) — XLA's conv lowering on v5e sits
            # at a per-pixel floor ~10x off the MXU roofline (STATUS.md).
            # 1-pixel dummy calls create/look up the params (DCE'd under
            # jit), keeping checkpoints interchangeable with the XLA path.
            from heterofusionrcnn_tpu.ops.pallas_conv import (
                conv3x3_affine_relu,
            )

            bn(conv(x[:, :1, :1, :]))
            scale, shift = _fold_bn_affine(self, "Conv_0", "BatchNorm_0")
            return conv3x3_affine_relu(
                x, self.variables["params"]["Conv_0"]["kernel"],
                scale, shift, relu=True,
                compute_dtype=self.dtype or jnp.float32,
                interpret=(mode == "interpret"),
            )
        use_matmul = (
            self.kernel == (3, 3)
            and self.strides == (1, 1)
            and os.environ.get("HFR_CONV_MATMUL", "0") == "1"
        )
        if use_matmul:
            # 1-pixel dummy call creates/looks up the params (DCE'd under
            # jit), keeping checkpoints interchangeable with the conv path.
            conv(x[:, :1, :1, :])
            pv = self.variables["params"]["Conv_0"]
            x = _conv3x3_shifted_matmul(
                x, pv["kernel"], pv.get("bias"), self.dtype
            )
        else:
            x = conv(x)
        x = bn(x)
        return nn.relu(x)


def _pallas_conv_mode(training, shape_ok, x_shape, cout, dtype,
                      transpose=False):
    """'' = XLA path; 'tpu' / 'interpret' = fused Pallas conv kernel.

    Inference-only (XLA keeps autodiff for training). Requires a 3x3 layer
    whose (H, W) admit a VMEM-fitting tile. HFR_PALLAS_CONV=0 disables
    (A/B knob); HFR_PALLAS_CONV_INTERPRET=1 forces interpret mode off-TPU
    for equivalence tests."""
    import os

    if training or not shape_ok:
        return ""
    # Default OFF until the on-chip A/B lands (flip the default to "1" with
    # measured numbers; the kernel is interpret-mode exact already).
    if os.environ.get("HFR_PALLAS_CONV", "0") == "0":
        return ""
    if len(x_shape) != 4 or min(x_shape[1], x_shape[2]) < 3:
        return ""
    from heterofusionrcnn_tpu.ops.pallas_conv import pick_conv_tiles

    cin = x_shape[3]
    elem = jnp.dtype(dtype or jnp.float32).itemsize
    if transpose:
        fits = pick_conv_tiles(x_shape[1], x_shape[2], cin, cout, elem,
                               im2col=False, halo=1, phases=4)
    else:
        fits = pick_conv_tiles(x_shape[1], x_shape[2], cin, cout, elem,
                               im2col=cin < 128)
    if fits[0] == 0:
        return ""
    # pallas_ok() (not a raw backend test) so HFR_FORCE_XLA_OPS=1 — the
    # bench/serving safe mode — pins the fused conv kernels to XLA too.
    from heterofusionrcnn_tpu.ops.dispatch import pallas_ok

    if pallas_ok():
        return "tpu"
    if os.environ.get("HFR_PALLAS_CONV_INTERPRET") == "1":
        return "interpret"
    return ""


def _fold_bn_affine(mod, conv_name, bn_name, eps=1e-3):
    """Fold inference BatchNorm (+ optional conv bias) into a per-channel
    (scale, shift) pair: y = z * s + t for z the raw conv output."""
    pv = mod.variables["params"]
    bs = mod.variables["batch_stats"][bn_name]
    g = pv[bn_name]["scale"]
    beta = pv[bn_name]["bias"]
    s = g / jnp.sqrt(bs["var"] + eps)
    t = beta - bs["mean"] * s
    bias = pv[conv_name].get("bias")
    if bias is not None:
        t = t + bias * s
    return s, t


def _convtranspose3x3_s2_matmul(x, w, b, compute_dtype):
    """EXACT 3x3 stride-2 SAME ConvTranspose as polyphase matmuls.

    With 2x input dilation only specific kernel taps see nonzero input per
    output-parity class: even outputs take 2 taps per axis, odd take 1
    (2.25 avg taps/pixel vs 9 for the conv lowering). Each tap is a
    channel-mixing matmul; the four phase planes interleave at the end.
    Tap mapping (probed against nn.ConvTranspose, which lays the kernel
    out so x[m] contributes w[2-t] to y[2m+t]):
      y[2m]   = x[m] w[2] + x[m-1] w[0]        (per axis)
      y[2m+1] = x[m] w[1]

    Args:
      x: (B, H, W, Cin); w: (3, 3, Cin, Cout) flax layout; b: (Cout,)|None.
    Returns: (B, 2H, 2W, Cout).
    """
    bsz, h, wd, cin = x.shape
    cd = compute_dtype or x.dtype
    cout = w.shape[-1]
    xs = x.astype(cd)
    # x[m-1] along rows / cols (zero before the edge).
    xr = jnp.pad(xs, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :-1]
    xc = jnp.pad(xs, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :-1]
    xrc = jnp.pad(xs, ((0, 0), (1, 0), (1, 0), (0, 0)))[:, :-1, :-1, :]

    def mm(t, ww):
        return jnp.einsum(
            "bhwc,cd->bhwd", t, ww.astype(cd),
            preferred_element_type=jnp.float32,
        )

    y00 = (
        mm(xs, w[2, 2]) + mm(xc, w[2, 0])
        + mm(xr, w[0, 2]) + mm(xrc, w[0, 0])
    )
    y01 = mm(xs, w[2, 1]) + mm(xr, w[0, 1])
    y10 = mm(xs, w[1, 2]) + mm(xc, w[1, 0])
    y11 = mm(xs, w[1, 1])
    if b is not None:
        bf = b.astype(jnp.float32)
        y00, y01, y10, y11 = y00 + bf, y01 + bf, y10 + bf, y11 + bf
    # Interleave phases: cols first (B,H,W,2,D)->(B,H,2W,D), then rows.
    even = jnp.stack([y00, y01], axis=3).reshape(bsz, h, 2 * wd, cout)
    odd = jnp.stack([y10, y11], axis=3).reshape(bsz, h, 2 * wd, cout)
    y = jnp.stack([even, odd], axis=2).reshape(bsz, 2 * h, 2 * wd, cout)
    return y.astype(cd)


class ConvTransposeBNRelu(nn.Module):
    """slim.conv2d_transpose + batch_norm + ReLU, stride 2.

    HFR_CONV_MATMUL=1 routes through the polyphase-matmul form (A/B knob —
    regresses e2e at the XLA level, see _conv3x3_shifted_matmul); param
    tree is identical either way."""

    features: int
    kernel: tuple = (3, 3)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, training: bool):
        import os

        convt = nn.ConvTranspose(
            self.features, self.kernel, (2, 2), padding="SAME",
            dtype=self.dtype, name="ConvTranspose_0",
        )
        bn = nn.BatchNorm(
            use_running_average=not training, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name="BatchNorm_0",
        )
        mode = _pallas_conv_mode(
            training, self.kernel == (3, 3), x.shape, self.features,
            self.dtype, transpose=True,
        )
        if mode:
            from heterofusionrcnn_tpu.ops.pallas_convtranspose import (
                convtranspose3x3_affine_relu,
            )

            bn(convt(x[:, :1, :1, :]))
            scale, shift = _fold_bn_affine(
                self, "ConvTranspose_0", "BatchNorm_0"
            )
            return convtranspose3x3_affine_relu(
                x, self.variables["params"]["ConvTranspose_0"]["kernel"],
                scale, shift, relu=True,
                compute_dtype=self.dtype or jnp.float32,
                interpret=(mode == "interpret"),
            )
        use_matmul = (
            self.kernel == (3, 3)
            and os.environ.get("HFR_CONV_MATMUL", "0") == "1"
        )
        if use_matmul:
            convt(x[:, :1, :1, :])  # params only; DCE'd under jit
            pv = self.variables["params"]["ConvTranspose_0"]
            x = _convtranspose3x3_s2_matmul(
                x, pv["kernel"], pv.get("bias"), self.dtype
            )
        else:
            x = convt(x)
        x = bn(x)
        return nn.relu(x)
