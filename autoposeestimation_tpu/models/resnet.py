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


def _space_to_batch(x, d):
    """(B, H, W, C) -> (B*d*d, H/d, W/d, C): subgrid (i, j) holds the pixels
    at (i::d, j::d). A 3x3 conv with kernel_dilation=d and padding=d on the
    original lattice is EXACTLY a dense 3x3 'SAME' conv on every subgrid
    (each dilated neighbour at offset +-d lands on the same subgrid's
    adjacent sample; the d-pixel zero pad maps to the subgrid's 1-pixel
    zero pad)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // d, d, w // d, d, c)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b * d * d, h // d, w // d, c)


def _batch_to_space(y, d, b):
    bd, hp, wp, c = y.shape
    y = y.reshape(b, d, d, hp, wp, c)
    y = y.transpose(0, 3, 1, 4, 2, 5)
    return y.reshape(b, hp * d, wp * d, c)


class BasicBlockPlain(nn.Module):
    """Reference PSPNet block: conv-relu-conv (+downsample) — *no* BatchNorm,
    with optional dilation (extractors.py:18-43).

    `s2b=True` computes dilated blocks via space-to-batch: rearrange the
    lattice into d*d subgrids once, run both 3x3 convs DENSE (the form XLA
    tiles best onto the MXU), add the residual in rearranged space (the
    permutation is pointwise), and restore. Mathematically exact (same
    reduction per output pixel; only conv lowering changes) and the param
    tree is IDENTICAL — nn.Conv's kernel shape/name does not depend on its
    dilation attribute — so trained and torch-imported weights are shared
    between both paths."""

    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.bfloat16
    s2b: bool = False

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        use_s2b = (self.s2b and d > 1 and self.stride == 1
                   and x.shape[-3] % d == 0 and x.shape[-2] % d == 0)
        dil = 1 if use_s2b else d
        b = x.shape[0]
        if use_s2b:
            x = _space_to_batch(x, d)
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=dil, kernel_dilation=(dil, dil),
                    use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=dil,
                    kernel_dilation=(dil, dil),
                    use_bias=False, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(y + residual)
        if use_s2b:
            y = _batch_to_space(y, d, b)
        return y


class DilatedResNetNoBN(nn.Module):
    """The PSPNet feature extractor: BN-free resnet18 with layers 3/4 at
    stride 1, dilation 2/4 — output stride 8, 512 channels
    (extractors.py:78-124; first block of each layer has dilation 1,
    remaining blocks carry the dilation, matching `_make_layer`)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)  # resnet18
    dtype: Dtype = jnp.bfloat16
    dil_s2b: bool = False  # space-to-batch lowering of the dilated blocks

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
                    s2b=self.dil_s2b,
                )(x)
        return x
