"""Classical RGB-D background-subtraction labeling as one jitted XLA graph.

Behavior parity with `createLabel_RGBD`
(/root/reference/label_generator/utils.py:45-364), the core of the zero-model
label-generation path, plus the 7-channel input builder for the learned BS
model (/root/reference/background_subtraction/utils.py:762-846).

Pipeline (all fused under jit; static image shape):
  1. depth clamp to measure_dist +-150 mm,
  2. table-plane depth fill-in over the center crop (3-point plane fit using
     the reference's extreme-point selection rules, incl. the >100-tie branch),
  3. per-channel weighted |differences| (HSV and/or RGB), hue rescaled x256/180,
     clipped at 100, summed; + weighted |depth difference| clipped at 100,
  4. threshold -> grayscale opening/closing,
  5. CCA keep best mean-score component above min_size,
  6. optional remove-below-(mean - 1 std),
  7. re-open/close (affects only component discovery — the reference's final
     masking applies to the pre-morphology array via numpy aliasing; we
     replicate that),
  8. CCA keep largest-area component, binarize to 255.

Known deliberate deviation: the reference casts float scores to uint8 before
cv2.connectedComponents, wrapping values that are exact multiples of 256 to
background. We treat any nonzero score as foreground (the wrap is a numeric
accident, not intent).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from . import cca as cca_ops
from . import morphology as morph

# Default channel weights (reference label_generator/utils.py:62-69).
P_HSV = (0.08026211175912534, 1.2577782150904344, 1.9483549172969372,
         1.392821046939864)
P_BOTH = (0.8, 0.6, 0.1, 0.3, 0.3, 0.5, 0.5)
P_RGB = (0.5, 0.5, 0.5, 1.0)

# Fixed normalization of the learned 7-channel BS model
# (/root/reference/background_subtraction/__init__.py:54-55).
BS_MEAN = (0.040278014, 0.04060352, 0.038310923, 0.0381776, 0.03656849,
           0.03636289, 0.03556486)
BS_STD = (0.059689723, 0.05965291, 0.056203008, 0.05619316, 0.054657422,
          0.054514673, 0.05377024)


def rgb_to_hsv_cv2(rgb):
    """cv2.COLOR_RGB2HSV for uint8-range input: H in [0,180), S,V in [0,255].

    Float math + rounding approximates cv2's fixed-point within +-1.
    """
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    safe = jnp.maximum(diff, 1e-9)
    h = jnp.where(
        v == r, 30.0 * (g - b) / safe,
        jnp.where(v == g, 60.0 + 30.0 * (b - r) / safe,
                  120.0 + 30.0 * (r - g) / safe))
    h = jnp.where(diff == 0, 0.0, h)
    h = jnp.where(h < 0, h + 180.0, h)
    s = jnp.where(v == 0, 0.0, diff * 255.0 / jnp.maximum(v, 1e-9))
    return jnp.stack([jnp.round(h), jnp.round(s), v], axis=-1)


def rgb_to_hsv_pil(rgb):
    """PIL Image.convert('HSV') semantics: H,S,V all in [0,255] (truncated).

    Used by the learned BS model's input builder (the reference loads frames
    via PIL there, background_subtraction/utils.py:749-752).
    """
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    diff = maxc - minc
    safe = jnp.maximum(diff, 1e-9)
    # colorsys hue in [0,1)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(diff == 0, 0.0, h)
    s = jnp.where(maxc == 0, 0.0, diff / jnp.maximum(maxc, 1e-9))
    return jnp.stack([jnp.floor(h * 255.0), jnp.floor(s * 255.0), maxc], axis=-1)


def _kth_true_flat_index(mask_flat, k):
    """Flat index of the (k+1)-th True element (raster order)."""
    c = jnp.cumsum(mask_flat.astype(jnp.int32))
    return jnp.argmax((c == k + 1) & mask_flat).astype(jnp.int32)


def _plane_fill(bg_depth, h_p: float = 0.3, w_p: float = 0.3):
    """Table-plane fill-in of the background depth center crop
    (reference utils.py:110-159). Returns the updated background depth."""
    h, w = bg_depth.shape
    r0, r1 = int(h / 2 - h * h_p), int(h / 2 + h * h_p)
    c0, c1 = int(w / 2 - w * w_p), int(w / 2 + w * w_p)
    center = bg_depth[r0:r1, c0:c1]
    ch, cw = center.shape
    valid = center != 0
    rows = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 1)

    vflat = valid.reshape(-1)
    rflat = rows.reshape(-1).astype(jnp.float32)
    cflat = cols.reshape(-1).astype(jnp.float32)
    dflat = center.reshape(-1)

    any_valid = jnp.any(vflat)
    big = jnp.int32(10 ** 9)
    rmax = jnp.max(jnp.where(vflat, rflat, -1.0))
    rmin = jnp.min(jnp.where(vflat, rflat, jnp.float32(big)))
    cmax = jnp.max(jnp.where(vflat, cflat, -1.0))

    lowest = vflat & (rflat == rmax)
    uppest = vflat & (rflat == rmin)
    rightest = vflat & (cflat == cmax)
    n_low = jnp.sum(lowest.astype(jnp.int32))
    n_up = jnp.sum(uppest.astype(jnp.int32))
    n_right = jnp.sum(rightest.astype(jnp.int32))

    up_idx = _kth_true_flat_index(uppest, n_up // 2)

    def many_lowest(_):
        # len(lowest) > 100: first and last of the lowest row + middle uppest
        a = _kth_true_flat_index(lowest, 0)
        c = _kth_true_flat_index(lowest, n_low - 1)
        return a, up_idx, c

    def few_lowest(_):
        a = _kth_true_flat_index(lowest, n_low // 2)
        c = _kth_true_flat_index(rightest, n_right // 2)
        return a, up_idx, c

    ia, ib, ic = jax.lax.cond(n_low > 100, many_lowest, few_lowest, None)

    def pt(i):
        return jnp.stack([rflat[i], cflat[i], dflat[i]])

    p1, p2, p3 = pt(ia), pt(ib), pt(ic)
    cp = jnp.cross(p3 - p1, p2 - p1)
    d = jnp.dot(cp, p3)
    a, b, c = cp[0], cp[1], cp[2]
    z = (d - a * rows.astype(jnp.float32) - b * cols.astype(jnp.float32)) / \
        jnp.where(jnp.abs(c) > 1e-9, c, 1e-9)
    dist_plane = jnp.sqrt(rows.astype(jnp.float32) ** 2
                          + cols.astype(jnp.float32) ** 2 + z ** 2)
    dist_plane = jnp.where(valid, center, dist_plane)
    dist_plane = morph.box_smooth(dist_plane, 5)
    new_center = jnp.where(any_valid, dist_plane, center)
    return bg_depth.at[r0:r1, c0:c1].set(new_center)


@functools.partial(jax.jit, static_argnames=(
    "threshold", "min_size", "open_k", "close_k", "hsv", "both", "do_cca",
    "remove_one_std"))
def create_label_rgbd(bg_rgb, fg_rgb, bg_depth, fg_depth, measure_dist,
                      threshold: float = 100.0,
                      p: Optional[Sequence[float]] = None,
                      min_size: int = 100,
                      open_k: int = 3,
                      close_k: int = 9,
                      hsv: bool = True,
                      both: bool = False,
                      do_cca: bool = True,
                      remove_one_std: bool = False):
    """createLabel_RGBD parity. Inputs: uint8-range RGB (H, W, 3) arrays and
    float depth (H, W) in mm; `measure_dist` is the camera->reference distance
    in mm (the reference's main flow always provides it). Returns a uint8
    (H, W) mask with values {0, 255}."""
    if p is None:
        p = P_HSV if hsv else (P_BOTH if both else P_RGB)
    p = tuple(float(v) for v in p)

    bg_rgb = bg_rgb.astype(jnp.float32)
    fg_rgb = fg_rgb.astype(jnp.float32)
    bg_depth = bg_depth.astype(jnp.float32)
    fg_depth = fg_depth.astype(jnp.float32)

    if hsv:
        bg = rgb_to_hsv_cv2(bg_rgb)
        fg = rgb_to_hsv_cv2(fg_rgb)
    elif both:
        bg = jnp.concatenate([rgb_to_hsv_cv2(bg_rgb), bg_rgb], axis=2)
        fg = jnp.concatenate([rgb_to_hsv_cv2(fg_rgb), fg_rgb], axis=2)
    else:
        bg, fg = bg_rgb, fg_rgb

    use_depth = p[-1] > 0
    if use_depth:
        lo = measure_dist - 150.0
        hi = measure_dist + 150.0
        fg_depth = jnp.where((fg_depth > hi) | (fg_depth < lo), 0.0, fg_depth)
        bg_depth = jnp.where((bg_depth > hi) | (bg_depth < lo), 0.0, bg_depth)
        bg_depth = _plane_fill(bg_depth)
        fg_depth = jnp.where(bg_depth == 0, 0.0, fg_depth)
        bg_depth = jnp.where(fg_depth == 0, 0.0, bg_depth)
        depth_mask = jnp.minimum(jnp.abs(fg_depth - bg_depth), 100.0)

    diff = jnp.abs(fg - bg)
    if hsv or both:
        diff = diff.at[:, :, 0].multiply(256.0 / 180.0)
    diff = jnp.minimum(diff, 100.0)
    weights = jnp.asarray(p[: diff.shape[2]], jnp.float32)
    score_color = jnp.sum(diff * weights[None, None, :], axis=2)

    score = score_color
    if use_depth:
        score = score + depth_mask * p[-1]

    score = jnp.where(score < threshold, 0.0, score)
    if open_k > 0:
        score = morph.opening(score, open_k)
    if close_k > 0:
        score = morph.closing(score, close_k)

    if not do_cca:
        return (score != 0).astype(jnp.uint8) * 255

    # CCA 1: best mean-score component above min_size; failure mode keeps the
    # background component (reference j=0 fallback).
    comp1, found1 = cca_ops.best_component_mask(
        score > 0, score, min_size=min_size, rule="mean")
    keep1 = jnp.where(found1, comp1, ~(score > 0))
    m = jnp.where(keep1, score_color, 0.0)

    if remove_one_std:
        nz = m != 0
        cnt = jnp.maximum(jnp.sum(nz.astype(jnp.float32)), 1.0)
        mean = jnp.sum(m) / cnt
        var = jnp.sum(jnp.where(nz, (m - mean) ** 2, 0.0)) / cnt
        std = jnp.sqrt(jnp.maximum(var, 0.0))
        m = jnp.where(m < mean - std, 0.0, m)

    morphed = m
    if open_k > 0:
        morphed = morph.opening(morphed, open_k)
    if close_k > 0:
        morphed = morph.closing(morphed, close_k)

    # CCA 2 on the morphed image; the final mask keeps the *pre-morphology*
    # pixels inside the winning component (reference aliasing semantics).
    comp2, found2 = cca_ops.best_component_mask(
        morphed > 0, morphed, min_size=min_size, rule="area")
    keep2 = jnp.where(found2, comp2, ~(morphed > 0))
    final = jnp.where(keep2, m, 0.0)
    return (final != 0).astype(jnp.uint8) * 255


@jax.jit
def build_bs_input(bg_rgb, fg_rgb, bg_depth, fg_depth, measure_dist):
    """7-channel input for the learned BS U-Net: (|dRGB|, |dHSV(PIL)|, |ddepth|)
    normalized with the fixed mean/std. Parity with
    /root/reference/background_subtraction/utils.py:755-846 including the
    uint8 wrap of the concatenated differences before ToTensor.

    Returns (H, W, 7) float32 (channel-last; models transpose as needed).
    """
    bg_rgb = bg_rgb.astype(jnp.float32)
    fg_rgb = fg_rgb.astype(jnp.float32)
    bg_depth = bg_depth.astype(jnp.float32)
    fg_depth = fg_depth.astype(jnp.float32)

    lo = measure_dist - 150.0
    hi = measure_dist + 150.0
    fg_depth = jnp.where((fg_depth > hi) | (fg_depth < lo), 0.0, fg_depth)
    bg_depth = jnp.where((bg_depth > hi) | (bg_depth < lo), 0.0, bg_depth)
    fg_depth = jnp.where(bg_depth == 0, 0.0, fg_depth)
    bg_depth = jnp.where(fg_depth == 0, 0.0, bg_depth)

    x_rgb = jnp.abs(fg_rgb - bg_rgb)
    x_hsv = jnp.abs(rgb_to_hsv_pil(fg_rgb) - rgb_to_hsv_pil(bg_rgb))
    x_depth = jnp.abs(fg_depth - bg_depth)[..., None]
    x = jnp.concatenate([x_rgb, x_hsv, x_depth], axis=2)
    # reference: np.array(x, dtype=np.uint8) — wraps mod 256 (depth diffs can
    # reach 300); then ToTensor scales by 1/255
    x = jnp.mod(jnp.floor(x), 256.0) / 255.0
    mean = jnp.asarray(BS_MEAN, jnp.float32)
    std = jnp.asarray(BS_STD, jnp.float32)
    return (x - mean) / std
