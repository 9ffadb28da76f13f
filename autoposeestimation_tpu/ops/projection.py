"""Camera projection ops: depth backprojection, point projection, quantized
bounding boxes, and static-shape masked point selection.

Replaces the reference's per-pixel Python loops
(/root/reference/pc_reconstruction/open3d_utils.py:215-243, the `get_surface`
hot loop at :171-213) and the numpy choose/backproject glue in the datasets and
live path (/root/reference/DenseFusion/datasets/myDatasetAugmented/dataset.py:250-275,
/root/reference/pipeline/utils.py:529-553) with fully vectorized, jit-safe
versions. Everything here uses static shapes: variable-size point sets are
(N, ...) arrays plus a validity count/mask.

Intrinsics are passed as a (4,) vector (fx, fy, ppx, ppy) — see
`utils.io.Intrinsics.as_array`.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# Reference image geometry (640x480) and the 40-px bbox quantization ladder
# (/root/reference/DenseFusion/datasets/myDatasetAugmented/dataset.py:338-341).
IMG_H = 480
IMG_W = 640
BORDER_STEP = 40
BORDER_MAX = 680


def pixels_to_points(rows, cols, depth_vals, intr):
    """Backproject pixel coordinates + depth to camera-frame points.

    x = (col - ppx) * z / fx ; y = (row - ppy) * z / fy ; z = depth.
    Matches /root/reference/pc_reconstruction/open3d_utils.py:215-231 (where
    p[0] is the row and p[1] the column). Depth must already be in the output
    unit (mm or m).
    """
    fx, fy, ppx, ppy = intr[0], intr[1], intr[2], intr[3]
    z = depth_vals
    x = (cols.astype(z.dtype) - ppx) * z / fx
    y = (rows.astype(z.dtype) - ppy) * z / fy
    return jnp.stack([x, y, z], axis=-1)


def depth_to_cloud(depth, intr):
    """Backproject a full (H, W) depth image to an (H*W, 3) camera-frame cloud.

    Zero-depth pixels produce (0, 0, 0); callers use `depth > 0` as validity.
    """
    h, w = depth.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    pts = pixels_to_points(rows, cols, depth.astype(jnp.float32), intr)
    return pts.reshape(h * w, 3)


def points_to_pixels(points, intr):
    """Project camera-frame points (..., 3) to integer (row, col) pixels.

    Matches /root/reference/pc_reconstruction/open3d_utils.py:233-243 (truncation
    toward zero via int()).
    """
    fx, fy, ppx, ppy = intr[0], intr[1], intr[2], intr[3]
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    # floor with a small epsilon: same truncation semantics as the reference's
    # int(), made robust to float32 rounding just below integer pixel centers.
    col = jnp.floor(x / (z / fx) + ppx + 1e-3).astype(jnp.int32)
    row = jnp.floor(y / (z / fy) + ppy + 1e-3).astype(jnp.int32)
    return jnp.stack([row, col], axis=-1)


def quantize_extent(extent):
    """Reference bbox-size quantization: grow to the next multiple of 40 unless
    already a multiple (strict-inequality interval ladder at dataset.py:350-357)."""
    extent = jnp.asarray(extent, jnp.int32)
    q = ((extent + BORDER_STEP - 1) // BORDER_STEP) * BORDER_STEP
    return jnp.minimum(q, BORDER_MAX)


def get_bbox(mask, img_h: int = IMG_H, img_w: int = IMG_W):
    """Quantized bbox (rmin, rmax, cmin, cmax) of a boolean mask — jit-safe.

    Behavior parity with /root/reference/DenseFusion/datasets/myDatasetAugmented/
    dataset.py:342-380: tight bbox, +1 on max, extent quantized to the border
    ladder, recentered, shifted inside the image. Returns int32 scalars; if the
    mask is empty, returns a bbox of minimal extent at the origin (callers must
    check `mask.any()`).
    """
    rows_any = jnp.any(mask, axis=1)
    cols_any = jnp.any(mask, axis=0)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (mask.shape[0], 1), 0)[:, 0]
    cidx = jax.lax.broadcasted_iota(jnp.int32, (mask.shape[1], 1), 0)[:, 0]
    big = jnp.int32(10 ** 9)
    rmin = jnp.min(jnp.where(rows_any, ridx, big))
    rmax = jnp.max(jnp.where(rows_any, ridx, -1)) + 1
    cmin = jnp.min(jnp.where(cols_any, cidx, big))
    cmax = jnp.max(jnp.where(cols_any, cidx, -1)) + 1
    empty = ~jnp.any(mask)
    rmin = jnp.where(empty, 0, rmin)
    rmax = jnp.where(empty, 1, rmax)
    cmin = jnp.where(empty, 0, cmin)
    cmax = jnp.where(empty, 1, cmax)

    r_b = quantize_extent(rmax - rmin)
    c_b = quantize_extent(cmax - cmin)
    rc = (rmin + rmax) // 2
    cc = (cmin + cmax) // 2
    rmin = rc - r_b // 2
    rmax = rc + r_b // 2
    cmin = cc - c_b // 2
    cmax = cc + c_b // 2
    # shift inside the image (same delta-based correction as the reference)
    rshift = jnp.maximum(-rmin, 0) - jnp.maximum(rmax - img_h, 0)
    cshift = jnp.maximum(-cmin, 0) - jnp.maximum(cmax - img_w, 0)
    return rmin + rshift, rmax + rshift, cmin + cshift, cmax + cshift


def fixed_crop_bbox(mask, crop: int, img_h: int = IMG_H, img_w: int = IMG_W):
    """(rmin, cmin) of a fixed `crop`-sized window centered on the mask bbox,
    clamped inside the image. The static window size is what lets the whole
    pose path compile once — the reference's variable 40-px-quantized bboxes
    (dataset.py:342-380) become a single static shape here; the quantized bbox
    information is preserved because only masked pixels are ever gathered.
    """
    rmin, rmax, cmin, cmax = get_bbox(mask, img_h, img_w)
    rc = (rmin + rmax) // 2
    cc = (cmin + cmax) // 2
    r0 = jnp.clip(rc - crop // 2, 0, img_h - crop)
    c0 = jnp.clip(cc - crop // 2, 0, img_w - crop)
    return r0, c0


def zoom_window_bbox(mask, crop: int, img_h: int = IMG_H, img_w: int = IMG_W):
    """(r0, c0, win): square window of dynamic side `win >= crop` covering the
    quantized bbox, clamped inside the image.

    For objects whose quantized bbox fits in `crop` this reproduces
    fixed_crop_bbox (win == crop, native scale). Larger masks — the round-1
    truncation case — get a bigger window that resample_window /
    backproject_choose_zoom map onto the static crop grid, so one compiled
    shape serves every object size (the reference handles this with
    variable-shape bs=1 crops, dataset.py:342-380)."""
    rmin, rmax, cmin, cmax = get_bbox(mask, img_h, img_w)
    ext = jnp.maximum(rmax - rmin, cmax - cmin)
    win = jnp.clip(ext, crop, min(img_h, img_w))
    rc = (rmin + rmax) // 2
    cc = (cmin + cmax) // 2
    r0 = jnp.clip(rc - win // 2, 0, img_h - win)
    c0 = jnp.clip(cc - win // 2, 0, img_w - win)
    return r0, c0, win


def zoom_window_bbox_np(mask: "np.ndarray", crop: int, img_h: int,
                        img_w: int):
    """Numpy twin of get_bbox + zoom_window_bbox with IDENTICAL integer math,
    for host-side dataset code. Training crops and serving crops must be the
    same function of the mask — a one-pixel window disagreement is a silent
    train/serve skew. Parity enforced by test_projection."""
    import numpy as np

    rows = np.any(mask, axis=1)
    cols = np.any(mask, axis=0)
    if not rows.any():
        rmin, rmax, cmin, cmax = 0, 1, 0, 1
    else:
        rw = np.where(rows)[0]
        cw = np.where(cols)[0]
        rmin, rmax = int(rw[0]), int(rw[-1]) + 1
        cmin, cmax = int(cw[0]), int(cw[-1]) + 1
    quant = lambda e: min(-(-e // BORDER_STEP) * BORDER_STEP, BORDER_MAX)
    r_b, c_b = quant(rmax - rmin), quant(cmax - cmin)
    rc, cc = (rmin + rmax) // 2, (cmin + cmax) // 2
    rmin, rmax = rc - r_b // 2, rc + r_b // 2
    cmin, cmax = cc - c_b // 2, cc + c_b // 2
    rshift = max(-rmin, 0) - max(rmax - img_h, 0)
    cshift = max(-cmin, 0) - max(cmax - img_w, 0)
    rmin, rmax = rmin + rshift, rmax + rshift
    cmin, cmax = cmin + cshift, cmax + cshift

    ext = max(rmax - rmin, cmax - cmin)
    win = int(np.clip(ext, crop, min(img_h, img_w)))
    rc2, cc2 = (rmin + rmax) // 2, (cmin + cmax) // 2
    r0 = int(np.clip(rc2 - win // 2, 0, img_h - win))
    c0 = int(np.clip(cc2 - win // 2, 0, img_w - win))
    return r0, c0, win


def resample_window(img, r0, c0, win, crop: int):
    """Nearest-neighbor gather of a dynamic (win, win) window onto a static
    (crop, crop) grid — the jit-safe variable-size crop (zoom semantics like
    the reference's myDatasetAugmented2 variant, dataset.py:139-146). When
    win == crop the index math reduces to an exact identity slice.

    The gather is written separably (row gather, then column gather): two
    1-D gathers move whole contiguous rows / strided columns, which XLA:TPU
    executes far faster than one pointwise 2-D gather of crop^2 elements."""
    ii = r0 + (jnp.arange(crop, dtype=jnp.int32) * win) // crop
    jj = c0 + (jnp.arange(crop, dtype=jnp.int32) * win) // crop
    return jnp.take(jnp.take(img, ii, axis=0), jj, axis=1)


def backproject_choose_zoom(depth, mask, intr, depth_scale, r0, c0, win,
                            crop: int, num_pt: int, key):
    """backproject_choose for the dynamic zoom window.

    Pixels are chosen on the (crop, crop) resample LATTICE of the window —
    each lattice cell maps to one exact native pixel (the nearest-neighbor
    index map ii/jj), so the cloud still backprojects exact native
    coordinates and `choose` directly addresses the resampled crop grid for
    the color-embedding gather. Working on the static crop^2 lattice instead
    of the full H*W image cuts the per-class selection cost ~3x; when
    win == crop (every object whose quantized bbox fits) the lattice IS the
    full window, bit-identical to full-window selection. For oversized
    objects (win > crop) candidates are the lattice subsample of the mask —
    the same spatial stratification the resampled color crop sees.

    The returned `count` keeps the full-resolution contract: the number of
    valid native mask pixels inside the window (callers gate found-ness and
    compare against the dataset path on it)."""
    h, w = depth.shape
    # fold the mask into the depth once: one separable gather then serves
    # both the validity test and the z read (valid == masked depth > 0)
    masked_depth = jnp.where(mask & (depth > 0), depth.astype(jnp.float32),
                             0.0)
    # full-res valid count (contract; cheap fused elementwise + reduction)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = ((rows_i >= r0) & (rows_i < r0 + win)
              & (cols_i >= c0) & (cols_i < c0 + win))
    count = jnp.sum((inside & (masked_depth > 0)).astype(jnp.int32))

    # lattice: one native pixel per crop cell (separable row/col gathers)
    ii = r0 + (jnp.arange(crop, dtype=jnp.int32) * win) // crop   # (crop,)
    jj = c0 + (jnp.arange(crop, dtype=jnp.int32) * win) // crop
    wdepth = jnp.take(jnp.take(masked_depth, ii, axis=0), jj, axis=1)
    valid = wdepth > 0
    choose, lat_count = choose_masked_indices(valid, num_pt, key)

    rows = ii[choose // crop]
    cols = jj[choose % crop]
    z = wdepth.reshape(-1)[choose] * depth_scale
    cloud = pixels_to_points(rows, cols, z, intr)
    # empty-lattice guard: count reflects full-res; an empty lattice with a
    # nonempty window can only happen for degenerate sub-pixel masks
    count = jnp.where(lat_count > 0, count, 0)
    return cloud, choose.astype(jnp.int32), count


@functools.partial(jax.jit, static_argnames=("num_pt",))
def choose_masked_indices(window_mask, num_pt: int, key) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select `num_pt` flat indices of True pixels in a (S, S) window — jit-safe.

    Behavior vs the reference's choose logic (dataset.py:250-257 /
    pipeline/utils.py:529-539): if more than num_pt masked pixels, draw a
    random subset without replacement in ascending order; otherwise wrap-pad
    (exact reference semantics: the first `count` valid indices in raster
    order, cycled). Returns (indices (num_pt,) int32, count ()=number of
    valid mask pixels). An empty mask yields count == 0 (indices all zero)
    — callers must gate.

    Implementation: rank selection instead of a 102k-element top_k/argsort
    (formerly the dominant cost of the crop stage). An inclusive cumsum
    assigns each valid pixel its raster rank; target ranks are mapped back
    to flat indices with one vectorized binary search (searchsorted over
    the monotone cumsum). The subsample draw picks one uniform rank per
    stratum [j*count/num_pt, (j+1)*count/num_pt) — distinct, ascending,
    spatially stratified along raster order. This is a deliberate deviation
    from the reference's plain uniform draw (np.random.choice without
    replacement): the marginal distribution is near-uniform, coverage
    variance is strictly lower, and only num_pt random numbers are needed
    instead of S*S. The dataset path (data/pose_dataset.py) mirrors the
    same stratified rule so train and serve sample identically.
    """
    flat = window_mask.reshape(-1)
    n = flat.shape[0]
    csum = jnp.cumsum(flat.astype(jnp.int32))
    count = csum[-1]
    j = jnp.arange(num_pt, dtype=jnp.int32)

    # stratified subsample ranks: one uniform pick per stratum (strata are
    # disjoint and nonempty whenever count >= num_pt)
    lo = (j * count) // num_pt
    hi = ((j + 1) * count) // num_pt
    u = jax.random.uniform(key, (num_pt,))
    r_strat = lo + (u * (hi - lo).astype(u.dtype)).astype(jnp.int32)
    # wrap ranks: raster-order valid list, cycled (reference parity)
    r_wrap = j % jnp.maximum(count, 1)
    ranks = jnp.where(count > num_pt, r_strat, r_wrap)

    idx = jnp.searchsorted(csum, ranks + 1, side="left").astype(jnp.int32)
    idx = jnp.minimum(idx, n - 1)
    indices = jnp.where(count > 0, idx, 0)
    return indices.astype(jnp.int32), count


def gather_window(img, r0, c0, crop: int):
    """Dynamic-slice a (H, W, ...) array to a static (crop, crop, ...) window."""
    start = (r0, c0) + (0,) * (img.ndim - 2)
    sizes = (crop, crop) + img.shape[2:]
    return jax.lax.dynamic_slice(img, start, sizes)


def backproject_choose(depth, mask, intr, depth_scale, r0, c0, crop: int,
                       num_pt: int, key):
    """The fused crop→choose→backproject step of the pose path.

    Returns (cloud (num_pt, 3) [m], choose (num_pt,) flat window indices,
    count ()). Matches dataset.py:260-275: z = depth * depth_scale,
    x from columns via (fx, ppx), y from rows via (fy, ppy).
    """
    dwin = gather_window(depth, r0, c0, crop).astype(jnp.float32)
    mwin = gather_window(mask, r0, c0, crop)
    valid = mwin & (dwin > 0)
    choose, count = choose_masked_indices(valid, num_pt, key)
    rows = r0 + choose // crop
    cols = c0 + choose % crop
    z = dwin.reshape(-1)[choose] * depth_scale
    cloud = pixels_to_points(rows, cols, z, intr)
    return cloud, choose, count
