"""Vanilla SegNet (legacy component).

Parity with /root/reference/DenseFusion/vanilla_segmentation/segnet.py: the
upstream YCB 13-conv VGG encoder/decoder with max-pooling-indices unpooling,
trained with cross-entropy. Not used by the main flow (the project's live
segmentation is the U-Net); kept for inventory parity and YCB experiments.

Max-unpooling is implemented exactly: 2x2/stride-2 pooling records the argmax
position inside each window; unpooling scatters values back to those
positions. With NHWC reshapes this is a pure gather/scatter-free
select — compiler-friendly on TPU.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def max_pool_with_indices(x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2x2 stride-2 max pool returning (pooled, one-hot indices (B,H/2,W/2,4,C))."""
    b, h, w, c = x.shape
    blocks = x.reshape(b, h // 2, 2, w // 2, 2, c)
    blocks = blocks.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // 2, w // 2, 4, c)
    idx = jnp.argmax(blocks, axis=3)
    pooled = jnp.max(blocks, axis=3)
    onehot = jnp.equal(
        jnp.arange(4).reshape(1, 1, 1, 4, 1), idx[:, :, :, None, :])
    return pooled, onehot


def max_unpool(x, onehot) -> jnp.ndarray:
    """Inverse of max_pool_with_indices."""
    b, h2, w2, c = x.shape
    blocks = x[:, :, :, None, :] * onehot.astype(x.dtype)
    blocks = blocks.reshape(b, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return blocks.reshape(b, h2 * 2, w2 * 2, c)


class _ConvStack(nn.Module):
    widths: Sequence[int]
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        for wdt in self.widths:
            x = nn.Conv(wdt, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=jnp.float32)(x)
            x = nn.relu(x)
        return x


class SegNet(nn.Module):
    """13-conv VGG16 encoder + mirrored decoder with index unpooling."""

    classes: int = 22  # upstream YCB default (21 objects + background)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc_widths = [(64, 64), (128, 128), (256, 256, 256),
                      (512, 512, 512), (512, 512, 512)]
        indices = []
        y = x.astype(self.dtype)
        for widths in enc_widths:
            y = _ConvStack(widths, self.dtype)(y, train)
            y, onehot = max_pool_with_indices(y)
            indices.append(onehot)

        dec_widths = [(512, 512, 512), (512, 512, 256), (256, 256, 128),
                      (128, 64), (64,)]
        for onehot, widths in zip(reversed(indices), dec_widths):
            y = max_unpool(y, onehot)
            y = _ConvStack(widths, self.dtype)(y, train)
        logits = nn.Conv(self.classes, (3, 3), padding=1,
                         dtype=jnp.float32)(y.astype(jnp.float32))
        return logits


def cross_entropy_loss(labels, logits):
    """Per-pixel CE (the vanilla_segmentation trainer's loss)."""
    logp = nn.log_softmax(logits, axis=-1)
    onehot = jnp.equal(
        jnp.arange(logits.shape[-1])[None, None, None, :],
        labels[..., None])
    return -jnp.mean(jnp.sum(logp * onehot, axis=-1))
