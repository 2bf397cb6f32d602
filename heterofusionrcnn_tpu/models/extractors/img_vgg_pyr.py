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

        h, w = image.shape[1], image.shape[2]
        x = block(image, *cfg.vgg_conv1, "conv1")
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = block(x, *cfg.vgg_conv2, "conv2")
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = block(x, *cfg.vgg_conv3, "conv3")
        x = nn.max_pool(x, (2, 2), (2, 2))
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

        conv1 = block(image, *cfg.vgg_conv1, "conv1")
        pool1 = nn.max_pool(conv1, (2, 2), (2, 2))
        conv2 = block(pool1, *cfg.vgg_conv2, "conv2")
        pool2 = nn.max_pool(conv2, (2, 2), (2, 2))
        conv3 = block(pool2, *cfg.vgg_conv3, "conv3")
        pool3 = nn.max_pool(conv3, (2, 2), (2, 2))
        conv4 = block(pool3, *cfg.vgg_conv4, "conv4")

        up3 = ConvTransposeBNRelu(cfg.vgg_conv3[1], dtype=self.dtype, name="upconv3")(
            conv4, training
        )
        fuse3 = ConvBNRelu(cfg.vgg_conv2[1], dtype=self.dtype, name="pyramid_fusion3")(
            jnp.concatenate([conv3, up3], axis=3), training
        )
        up2 = ConvTransposeBNRelu(cfg.vgg_conv2[1], dtype=self.dtype, name="upconv2")(
            fuse3, training
        )
        fuse2 = ConvBNRelu(cfg.vgg_conv1[1], dtype=self.dtype, name="pyramid_fusion2")(
            jnp.concatenate([conv2, up2], axis=3), training
        )
        up1 = ConvTransposeBNRelu(cfg.vgg_conv1[1], dtype=self.dtype, name="upconv1")(
            fuse2, training
        )
        fuse1 = ConvBNRelu(cfg.vgg_conv1[1], dtype=self.dtype, name="pyramid_fusion1")(
            jnp.concatenate([conv1, up1], axis=3), training
        )
        return fuse1
