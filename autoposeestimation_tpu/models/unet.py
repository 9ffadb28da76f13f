"""U-Net with a ResNet34 encoder — segmentation-models-pytorch parity.

The reference trains `smp.Unet('resnet34', classes=n, activation='softmax')`
for multi-class segmentation (/root/reference/segmentation/__init__.py:12-14,
main.py:404-417) and the same with in_channels=7 / classes=2 for the learned
background-subtraction model (/root/reference/background_subtraction/__init__.py:275-279).

smp decoder contract reproduced here: 5 decoder blocks with channels
(256, 128, 64, 32, 16); each block nearest-2x-upsamples, concatenates the
matching encoder skip (deepest first; the last block has no skip), then applies
two conv3x3-BN-ReLU stacks. Segmentation head = conv3x3 to `classes`.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import upsample_nearest_2x
from .resnet import ResNetEncoder

Dtype = Any


class DecoderBlock(nn.Module):
    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False,
                 upsample: bool = True, pool_skip: int = 1):
        if upsample:
            x = upsample_nearest_2x(x)
        if skip is not None:
            if pool_skip > 1:
                # out_stride relowering: the block stays on x's coarse
                # lattice, so subsample the finer skip down to it. Strided
                # nearest subsampling (not avg_pool) because it reproduces
                # the encoder's ceil-mode dims exactly on odd sizes:
                # ceil(ceil(H/2)/2) == ceil(H/4) == len(range(0, ceil(H/2), 2))
                skip = skip[:, ::pool_skip, ::pool_skip, :]
            # ceil-mode stride-2 encoders overshoot on odd dims (15 -> 8 ->
            # upsampled 16); crop to the skip — a no-op for /32-aligned inputs
            x = x[:, :skip.shape[1], :skip.shape[2], :]
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype)(x)
            # BN compute dtype follows the block dtype (flax computes the
            # batch statistics in f32 internally either way; dtype=f32 here
            # round-tripped every full-res decoder map through f32 — pure
            # HBM traffic in bf16 mode, bit-identical in f32 builds)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    """U-Net resnet34. Input NHWC float (normalized); output logits NHWC
    (classes last). Any H/W >= 32 works (decoder crops to the encoder skips);
    multiples of 32 avoid the crops entirely.

    `remat=True` rematerializes the encoder in the backward pass
    (jax.checkpoint) — trades ~25% more FLOPs for dropping the encoder
    activations from HBM, enabling larger batches at full 480x640 on a
    16 GB chip.

    `out_stride` (serving relowering, round-5 roofline): the decoder stops
    UPSAMPLING once the lattice reaches /out_stride — blocks whose nominal
    output would be finer run on the /out_stride grid instead, with their
    encoder skips nearest-subsampled down to it, and the head emits logits
    at (ceil(H/s), ceil(W/s)). The param tree is IDENTICAL to out_stride=1
    (every conv keeps its channel counts; only lattices shrink), so trained
    weights are stride-interchangeable. Motivation: the last two decoder
    blocks + head convolve 16/32-channel maps on the full/half-res lattices
    — shapes that cannot fill the 128-lane MXU — and together held the
    serving U-Net stage at ~14 TF/s while the pose stages ran at 85-100
    (docs/ROUND5.md task 2). out_stride=1 is the exact default; serving
    callers opt in via build_models(seg_out_stride=...), ADD-gated like
    emb_stride."""

    classes: int
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    encoder_stages: Sequence[int] = (3, 4, 6, 3)
    dtype: Dtype = jnp.bfloat16
    remat: bool = False
    out_stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        encoder_cls = (nn.remat(ResNetEncoder, static_argnums=(2,))
                       if self.remat else ResNetEncoder)
        # fixed module name: remat and plain variants share one param tree
        feats = encoder_cls(self.encoder_stages, dtype=self.dtype,
                            name="ResNetEncoder_0")(x, train)
        # skips, deepest first: [/16, /8, /4, /2], then None at full res
        skips = [feats[3], feats[2], feats[1], feats[0], None]
        y = feats[4]
        # nominal output lattice of each decoder block
        strides = (16, 8, 4, 2, 1)
        for features, skip, nominal in zip(self.decoder_channels, skips,
                                           strides):
            if nominal >= self.out_stride:
                y = DecoderBlock(features, dtype=self.dtype)(y, skip, train)
            else:
                y = DecoderBlock(features, dtype=self.dtype)(
                    y, skip, train, upsample=False,
                    pool_skip=self.out_stride // nominal)
        logits = nn.Conv(self.classes, (3, 3), padding=1,
                         dtype=jnp.float32)(y.astype(jnp.float32))
        return logits
