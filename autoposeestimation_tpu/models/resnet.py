"""ResNet encoders in flax: the BatchNorm torchvision-style family (U-Net
encoder, smp parity) and the BN-free dilated variant the DenseFusion PSPNet
uses (/root/reference/DenseFusion/lib/extractors.py:78-124).

All modules are NHWC, take a `train` flag for BN, and default to bfloat16
compute with float32 params (TPU MXU-friendly); logits/outputs are cast back
to float32 by callers where needed.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class BasicBlockBN(nn.Module):
    """torchvision BasicBlock: conv-bn-relu-conv-bn + identity, relu."""

    features: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    dtype=self.dtype)(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """torchvision resnet18/34-style encoder returning the 5 U-Net skip
    feature maps [/2, /4, /8, /16, /32] (smp encoder-depth-5 contract;
    resnet34 channels: 64, 64, 128, 256, 512)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # resnet34
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        feats = []
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        feats.append(x)  # /2, 64ch
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        widths = (64, 128, 256, 512)
        for stage, (blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = BasicBlockBN(width, stride, dtype=self.dtype)(x, train)
            feats.append(x)  # /4, /8, /16, /32
        return tuple(feats)


class BasicBlockPlain(nn.Module):
    """Reference PSPNet block: conv-relu-conv (+downsample) — *no* BatchNorm,
    with optional dilation (extractors.py:18-43)."""

    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=self.dilation,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=self.dilation,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(x)
        return nn.relu(y + residual)


class DilatedResNetNoBN(nn.Module):
    """The PSPNet feature extractor: BN-free resnet18 with layers 3/4 at
    stride 1, dilation 2/4 — output stride 8, 512 channels
    (extractors.py:78-124; first block of each layer has dilation 1,
    remaining blocks carry the dilation, matching `_make_layer`)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)  # resnet18
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        specs = [  # (width, first_stride, tail_dilation)
            (64, 1, 1),
            (128, 2, 1),
            (256, 1, 2),
            (512, 1, 4),
        ]
        for (width, first_stride, dil), blocks in zip(specs, self.stage_sizes):
            for b in range(blocks):
                x = BasicBlockPlain(
                    width,
                    stride=first_stride if b == 0 else 1,
                    dilation=1 if b == 0 else dil,
                    dtype=self.dtype,
                )(x)
        return x
