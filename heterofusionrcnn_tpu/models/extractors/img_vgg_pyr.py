"""VGG-pyramid image feature extractor (parity with hf/core/
feature_extractors/img_vgg_pyramid.py): 4 VGG conv blocks with 3 max-pools,
then a transpose-conv decoder with skip concats back to full resolution.
Output is a full-res feature map with vgg_conv1 filters (32) channels, the
map the RPN gathers per-point image features from.

All convs are 3x3 SAME + BN + ReLU. bfloat16-friendly: convs dominate and XLA
tiles them onto the MXU; keep inputs NHWC.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from heterofusionrcnn_tpu.configs.config import ImgVggPyrConfig
from heterofusionrcnn_tpu.models.extractors.layers import (
    ConvBNRelu,
    ConvTransposeBNRelu,
)

# KITTI per-channel means (img_feature_extractor.py:8-11).
KITTI_RGB_MEANS = (92.8403, 97.7996, 93.5843)


def preprocess_image(image: jnp.ndarray) -> jnp.ndarray:
    """Mean-subtract each RGB channel (ImgFeatureExtractor.preprocess_input)."""
    means = jnp.asarray(KITTI_RGB_MEANS, image.dtype)
    return image - means


def _maybe_downsample(image: jnp.ndarray, ds: int) -> jnp.ndarray:
    """Average-pool the input image by the config downsample factor (1 = the
    reference's full-resolution behavior)."""
    if ds <= 1:
        return image
    return nn.avg_pool(image, (ds, ds), (ds, ds))


def _pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 max-pool robust to odd spatial dims: pads the trailing edge with
    -inf so ceil-division sizes keep every pixel (a no-op at the reference's
    even sizes)."""
    pad_h, pad_w = x.shape[1] % 2, x.shape[2] % 2
    return nn.max_pool(
        x, (2, 2), (2, 2), padding=((0, pad_h), (0, pad_w))
    )


def _crop_to(x: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Crop a stride-2 ConvTranspose output (always even-sized) back to the
    skip connection's spatial dims (no-op when they already match)."""
    return x[:, : like.shape[1], : like.shape[2], :]


class ImgVgg(nn.Module):
    """Plain VGG encoder + bilinear upsampling back to full resolution
    (reference img_vgg.py:31-122, upsampling_multiplier = downsampling
    factor): the lighter alternative to the pyramid decoder."""

    config: ImgVggPyrConfig
    dtype: object = None

    @nn.compact
    def __call__(self, image, training: bool):
        cfg = self.config

        def block(x, repeats, filters, name):
            for i in range(repeats):
                x = ConvBNRelu(filters, dtype=self.dtype, name=f"{name}_{i + 1}")(
                    x, training
                )
            return x

        image = _maybe_downsample(image, cfg.downsample)
        h, w = image.shape[1], image.shape[2]
        x = block(image, *cfg.vgg_conv1, "conv1")
        x = _pool2(x)
        x = block(x, *cfg.vgg_conv2, "conv2")
        x = _pool2(x)
        x = block(x, *cfg.vgg_conv3, "conv3")
        x = _pool2(x)
        x = block(x, *cfg.vgg_conv4, "conv4")
        return jax.image.resize(
            x, (x.shape[0], h, w, x.shape[3]), method="bilinear"
        )


class ImgVggPyr(nn.Module):
    """U-Net-shaped VGG (reference img_vgg_pyramid.py:31-172)."""

    config: ImgVggPyrConfig
    dtype: object = None

    @nn.compact
    def __call__(self, image, training: bool):
        """
        Args:
          image: (B, H, W, 3) mean-subtracted; H, W divisible by 8.
        Returns:
          (B, H, W, vgg_conv1_filters) full-resolution feature map.
        """
        cfg = self.config

        def block(x, repeats, filters, name):
            for i in range(repeats):
                x = ConvBNRelu(filters, dtype=self.dtype, name=f"{name}_{i + 1}")(
                    x, training
                )
            return x

        image = _maybe_downsample(image, cfg.downsample)
        conv1 = block(image, *cfg.vgg_conv1, "conv1")
        pool1 = _pool2(conv1)
        conv2 = block(pool1, *cfg.vgg_conv2, "conv2")
        pool2 = _pool2(conv2)
        conv3 = block(pool2, *cfg.vgg_conv3, "conv3")
        pool3 = _pool2(conv3)
        conv4 = block(pool3, *cfg.vgg_conv4, "conv4")

        up3 = ConvTransposeBNRelu(cfg.vgg_conv3[1], dtype=self.dtype, name="upconv3")(
            conv4, training
        )
        fuse3 = ConvBNRelu(cfg.vgg_conv2[1], dtype=self.dtype, name="pyramid_fusion3")(
            jnp.concatenate([conv3, _crop_to(up3, conv3)], axis=3), training
        )
        up2 = ConvTransposeBNRelu(cfg.vgg_conv2[1], dtype=self.dtype, name="upconv2")(
            fuse3, training
        )
        fuse2 = ConvBNRelu(cfg.vgg_conv1[1], dtype=self.dtype, name="pyramid_fusion2")(
            jnp.concatenate([conv2, _crop_to(up2, conv2)], axis=3), training
        )
        up1 = ConvTransposeBNRelu(cfg.vgg_conv1[1], dtype=self.dtype, name="upconv1")(
            fuse2, training
        )
        fuse1 = ConvBNRelu(cfg.vgg_conv1[1], dtype=self.dtype, name="pyramid_fusion1")(
            jnp.concatenate([conv1, _crop_to(up1, conv1)], axis=3), training
        )
        return fuse1
