"""Segmentation model registry variants: LinkNet and PSPNet-seg.

The reference's model registry offers {Unet, PsPNet, LinkNet} over smp
(/root/reference/segmentation/__init__.py:12-14); only Unet/resnet34 is
exercised by the TUI but the registry is part of the surface. Both variants
share the ResNet34-BN encoder.

LinkNet (smp semantics): decoder blocks project to in/4 with 1x1 conv,
transpose-conv upsample x2, project to out channels; skip connections are
*added* (not concatenated). PSPNet-seg: PSP pooling on the /8 feature map,
conv head, bilinear upsample to full resolution.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import resize_bilinear, upsample_nearest_2x, adaptive_avg_pool
from .resnet import ResNetEncoder

Dtype = Any


class LinkNetDecoderBlock(nn.Module):
    out_features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = nn.Conv(c // 4, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.ConvTranspose(c // 4, (4, 4), strides=(2, 2), padding="SAME",
                             use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_features, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(y)
        return nn.relu(y)


class LinkNet(nn.Module):
    """LinkNet-resnet34. Output logits at input resolution."""

    classes: int
    encoder_stages: Sequence[int] = (3, 4, 6, 3)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNetEncoder(self.encoder_stages, dtype=self.dtype)(x, train)
        skips = [feats[2], feats[1], feats[0]]  # /8, /4, /2
        widths = [256, 128, 64, 64]
        y = feats[4]  # /32
        y = LinkNetDecoderBlock(widths[0], self.dtype)(y, train) \
            + feats[3].astype(self.dtype)  # -> /16
        y = LinkNetDecoderBlock(widths[1], self.dtype)(y, train) \
            + skips[0].astype(self.dtype)  # -> /8
        y = LinkNetDecoderBlock(widths[2], self.dtype)(y, train) \
            + skips[1].astype(self.dtype)  # -> /4
        y = LinkNetDecoderBlock(widths[3], self.dtype)(y, train) \
            + skips[2].astype(self.dtype)  # -> /2
        y = upsample_nearest_2x(y)
        logits = nn.Conv(self.classes, (3, 3), padding=1, dtype=jnp.float32)(
            y.astype(jnp.float32))
        return logits


class PSPNetSeg(nn.Module):
    """PSPNet segmentation head over the resnet34 encoder's /8 features."""

    classes: int
    encoder_stages: Sequence[int] = (3, 4, 6, 3)
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[-3], x.shape[-2]
        feats = ResNetEncoder(self.encoder_stages, dtype=self.dtype)(x, train)
        f = feats[2]  # /8, 128ch
        fh, fw = f.shape[-3], f.shape[-2]
        priors = [f]
        for s in self.sizes:
            p = adaptive_avg_pool(f, s)
            p = nn.Conv(f.shape[-1], (1, 1), use_bias=False,
                        dtype=self.dtype)(p)
            priors.append(resize_bilinear(p, (fh, fw)).astype(self.dtype))
        y = jnp.concatenate(priors, axis=-1)
        y = nn.Conv(512, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Dropout(0.1, deterministic=not train)(y)
        logits = nn.Conv(self.classes, (1, 1), dtype=jnp.float32)(
            y.astype(jnp.float32))
        return resize_bilinear(logits, (h, w))
