"""PSPNet color-embedding network used inside DenseFusion's PoseNet.

Parity with /root/reference/DenseFusion/lib/pspnet.py and lib/extractors.py:
BN-free dilated ResNet18 (stride 8, 512ch) -> PSP pyramid pooling over sizes
(1, 2, 3, 6) with 1x1 convs + bilinear upsample -> 1x1 bottleneck to 1024 +
ReLU -> three (2x bilinear upsample + conv3x3 + PReLU) stages 1024->256->64->64
with dropout -> final 1x1 conv to 32 + log_softmax over channels.

Input spatial size must be a multiple of 8 (the reference's 40-px-quantized
crops always are). Output spatial size == input spatial size, 32 channels.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import adaptive_avg_pool, resize_bilinear
from .resnet import DilatedResNetNoBN

Dtype = Any


class PSPModule(nn.Module):
    out_features: int = 1024
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        feats = x.shape[-1]
        priors = []
        for s in self.sizes:
            p = adaptive_avg_pool(x, s)
            p = nn.Conv(feats, (1, 1), use_bias=False, dtype=self.dtype)(p)
            # F.upsample(..., mode='bilinear') defaults to align_corners=False
            # in the torch versions the reference ran (>= 0.4)
            priors.append(resize_bilinear(p, (h, w), align_corners=False)
                          .astype(self.dtype))
        priors.append(x)
        y = jnp.concatenate(priors, axis=-1)
        y = nn.Conv(self.out_features, (1, 1), dtype=self.dtype)(y)
        return nn.relu(y)


class PSPUpsample(nn.Module):
    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        x = resize_bilinear(x, (2 * h, 2 * w), align_corners=True)
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(
            x.astype(self.dtype))
        # PReLU with a single shared slope (torch nn.PReLU() default)
        return nn.PReLU()(x.astype(jnp.float32)).astype(self.dtype)


class PSPNet(nn.Module):
    """Returns per-pixel 32-d log-softmax embeddings (B, H, W, 32)."""

    embed_dim: int = 32
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = DilatedResNetNoBN(dtype=self.dtype)(x.astype(self.dtype))
        p = PSPModule(1024, dtype=self.dtype)(f)
        p = nn.Dropout(0.3, deterministic=not train)(p)
        p = PSPUpsample(256, dtype=self.dtype)(p)
        p = nn.Dropout(0.15, deterministic=not train)(p)
        p = PSPUpsample(64, dtype=self.dtype)(p)
        p = nn.Dropout(0.15, deterministic=not train)(p)
        p = PSPUpsample(64, dtype=self.dtype)(p)
        logits = nn.Conv(self.embed_dim, (1, 1), dtype=jnp.float32)(
            p.astype(jnp.float32))
        return nn.log_softmax(logits, axis=-1)
