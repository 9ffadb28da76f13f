"""Grayscale morphology + box smoothing as XLA reduce-window ops.

Replaces the cv2 morphology in the classical label generator
(/root/reference/label_generator/utils.py:26-42: `opening`, `closing`,
`smoothing` with all-ones square kernels). Grayscale erosion with a flat kernel
is a window-min, dilation a window-max — both map directly onto
`lax.reduce_window`, which XLA lowers to fused VPU code on TPU.

Border semantics match OpenCV defaults: erode pads with +inf, dilate with -inf
(cv2's `morphologyDefaultBorderValue`), the box filter uses BORDER_REFLECT_101.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _reduce2d(img, kernel_size: int, op, init):
    # OpenCV anchors flat kernels at (k//2, k//2) for both erode and dilate:
    # windows span [-k//2, k-1-k//2]. Symmetric for odd kernels; for even ones
    # (the reference's open=6 / close=6 at /root/reference/main.py:183) the
    # asymmetry matters (verified empirically against cv2 in the tests).
    lo = kernel_size // 2
    hi = kernel_size - 1 - lo
    return jax.lax.reduce_window(
        img,
        init,
        op,
        window_dimensions=(kernel_size, kernel_size),
        window_strides=(1, 1),
        padding=((lo, hi), (lo, hi)),
    )


def erode(img, kernel_size: int = 5):
    """Window-min with a kernel_size x kernel_size all-ones structuring element."""
    neg_inf = jnp.asarray(jnp.inf, img.dtype) if jnp.issubdtype(img.dtype, jnp.floating) \
        else jnp.iinfo(img.dtype).max
    return _reduce2d(img, kernel_size, jax.lax.min, neg_inf)


def dilate(img, kernel_size: int = 5):
    """Window-max with a kernel_size x kernel_size all-ones structuring element."""
    inf = jnp.asarray(-jnp.inf, img.dtype) if jnp.issubdtype(img.dtype, jnp.floating) \
        else jnp.iinfo(img.dtype).min
    return _reduce2d(img, kernel_size, jax.lax.max, inf)


def opening(img, kernel_size: int = 5):
    """Erode then dilate (cv2.MORPH_OPEN)."""
    return dilate(erode(img, kernel_size), kernel_size)


def closing(img, kernel_size: int = 5):
    """Dilate then erode (cv2.MORPH_CLOSE)."""
    return erode(dilate(img, kernel_size), kernel_size)


def box_smooth(img, kernel_size: int = 5):
    """Normalized box filter, REFLECT_101 border (cv2.filter2D default).

    Used by the table-plane depth fill (/root/reference/label_generator/utils.py:158).
    """
    pad = kernel_size // 2
    padded = jnp.pad(img.astype(jnp.float32), pad, mode="reflect")
    summed = jax.lax.reduce_window(
        padded,
        jnp.float32(0.0),
        jax.lax.add,
        window_dimensions=(kernel_size, kernel_size),
        window_strides=(1, 1),
        padding="VALID",
    )
    return (summed / (kernel_size * kernel_size)).astype(img.dtype)
