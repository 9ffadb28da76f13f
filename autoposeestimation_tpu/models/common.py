"""Shared model utilities: interpolation, adaptive pooling, normalization."""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

# ImageNet normalization used for all 3-channel model inputs
# (/root/reference/pipeline/utils.py:689-690 and 3 other sites).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_imagenet(img):
    """uint8-range RGB (..., H, W, 3) -> normalized float (ToTensor+Normalize)."""
    x = img.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std


def _interp_1d_weights(out_size: int, in_size: int, align_corners: bool):
    """Gather indices + lerp weights for 1D linear resize (static sizes)."""
    if align_corners and out_size > 1:
        src = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        src = jnp.clip(src, 0.0, in_size - 1)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w1 = src - i0.astype(jnp.float32)
    return i0, i1, 1.0 - w1, w1


def resize_bilinear(x, out_hw: Tuple[int, int], align_corners: bool = False):
    """Bilinear resize of (..., H, W, C) matching torch's interpolate
    semantics for either align_corners mode (the PSP decoder uses
    align_corners=True, the PSP pyramid uses the pre-0.4 default True as well
    via F.upsample; nn.Upsample in PSPUpsample passes align_corners=True)."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    r0, r1, wr0, wr1 = _interp_1d_weights(oh, h, align_corners)
    c0, c1, wc0, wc1 = _interp_1d_weights(ow, w, align_corners)
    # keep the compute dtype of the input: f32 weights on bf16 features
    # would promote every intermediate to f32 — at the PSP decoder's 320^2
    # maps that doubles HBM traffic for lerp weights the following bf16
    # conv rounds away anyway. f32 inputs keep the exact f32 path.
    if jnp.issubdtype(x.dtype, jnp.floating):
        wr0, wr1 = wr0.astype(x.dtype), wr1.astype(x.dtype)
        wc0, wc1 = wc0.astype(x.dtype), wc1.astype(x.dtype)
    xr = (jnp.take(x, r0, axis=-3) * wr0[:, None, None]
          + jnp.take(x, r1, axis=-3) * wr1[:, None, None])
    out = (jnp.take(xr, c0, axis=-2) * wc0[:, None]
           + jnp.take(xr, c1, axis=-2) * wc1[:, None])
    return out


def upsample_nearest_2x(x):
    """Nearest-neighbor 2x upsample of (..., H, W, C) (U-Net decoder)."""
    x = jnp.repeat(x, 2, axis=-3)
    return jnp.repeat(x, 2, axis=-2)


def adaptive_avg_pool(x, out_size: int):
    """torch AdaptiveAvgPool2d for (..., H, W, C): cell (i, j) averages
    rows [floor(i*H/s), ceil((i+1)*H/s)) — static unrolled (s <= 6 here)."""
    h, w = x.shape[-3], x.shape[-2]
    s = out_size
    rows = []
    for i in range(s):
        r0, r1 = (i * h) // s, -(-((i + 1) * h) // s)
        cols = []
        for j in range(s):
            c0, c1 = (j * w) // s, -(-((j + 1) * w) // s)
            cols.append(jnp.mean(x[..., r0:r1, c0:c1, :], axis=(-3, -2)))
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)
