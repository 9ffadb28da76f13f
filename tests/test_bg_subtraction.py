"""Classical background-subtraction label generator: color conversions vs
cv2/PIL goldens and end-to-end mask extraction on synthetic RGB-D scenes."""
import cv2
import jax.numpy as jnp
import numpy as np
from PIL import Image

from autoposeestimation_tpu.ops import bg_subtraction as bgs


def test_rgb_to_hsv_cv2_parity():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    want = cv2.cvtColor(rgb, cv2.COLOR_RGB2HSV).astype(np.float32)
    got = np.asarray(bgs.rgb_to_hsv_cv2(jnp.asarray(rgb, jnp.float32)))
    # H wraps at 180: 0 and 179 are adjacent
    dh = np.abs(got[..., 0] - want[..., 0])
    dh = np.minimum(dh, 180 - dh)
    assert dh.max() <= 1.0
    assert np.abs(got[..., 1] - want[..., 1]).max() <= 1.0
    assert np.abs(got[..., 2] - want[..., 2]).max() == 0.0


def test_rgb_to_hsv_pil_parity():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    want = np.asarray(Image.fromarray(rgb).convert("HSV"), dtype=np.float32)
    got = np.asarray(bgs.rgb_to_hsv_pil(jnp.asarray(rgb, jnp.float32)))
    dh = np.abs(got[..., 0] - want[..., 0])
    dh = np.minimum(dh, 256 - dh)
    assert dh.max() <= 1.0
    assert np.abs(got[..., 1] - want[..., 1]).max() <= 1.0
    assert np.abs(got[..., 2] - want[..., 2]).max() == 0.0


def synth_scene(seed=0, h=120, w=160):
    """Background plane + a bright foreground square with closer depth."""
    rng = np.random.default_rng(seed)
    bg_rgb = np.full((h, w, 3), 90, np.float32) + rng.normal(0, 3, (h, w, 3))
    fg_rgb = bg_rgb.copy()
    fg_rgb[40:80, 60:110] = np.asarray([200, 40, 40]) + rng.normal(0, 3, (40, 50, 3))
    dist = 800.0
    bg_depth = np.full((h, w), dist, np.float32) + rng.normal(0, 2, (h, w))
    fg_depth = bg_depth.copy()
    fg_depth[40:80, 60:110] -= 80.0  # object 8 cm above table
    # depth holes
    bg_depth[rng.random((h, w)) < 0.05] = 0
    return bg_rgb, fg_rgb, bg_depth, fg_depth, dist


def iou(a, b):
    a = a > 0
    b = b > 0
    return (a & b).sum() / max((a | b).sum(), 1)


def test_create_label_rgbd_recovers_object():
    bg_rgb, fg_rgb, bg_depth, fg_depth, dist = synth_scene()
    mask = np.asarray(bgs.create_label_rgbd(
        jnp.asarray(fg_rgb) * 0 + jnp.asarray(bg_rgb),  # background
        jnp.asarray(fg_rgb),
        jnp.asarray(bg_depth), jnp.asarray(fg_depth), dist,
        threshold=30.0, hsv=False, both=True, open_k=6, close_k=6,
        remove_one_std=True))
    want = np.zeros(mask.shape, bool)
    want[40:80, 60:110] = True
    assert mask.dtype == np.uint8
    assert set(np.unique(mask)) <= {0, 255}
    assert iou(mask, want) > 0.7, iou(mask, want)


def test_create_label_rgbd_picks_best_of_two_blobs():
    bg_rgb, fg_rgb, bg_depth, fg_depth, dist = synth_scene(seed=2)
    # second, weaker blob (should lose the mean-score CCA)
    fg_rgb[10:20, 10:22] += 40.0
    mask = np.asarray(bgs.create_label_rgbd(
        jnp.asarray(bg_rgb), jnp.asarray(fg_rgb),
        jnp.asarray(bg_depth), jnp.asarray(fg_depth), dist,
        threshold=30.0, hsv=False, both=True, open_k=3, close_k=6))
    assert mask[55, 80] == 255          # main object kept
    assert mask[14, 15] == 0            # weak blob rejected


def test_create_label_rgbd_hsv_mode():
    bg_rgb, fg_rgb, bg_depth, fg_depth, dist = synth_scene(seed=3)
    mask = np.asarray(bgs.create_label_rgbd(
        jnp.asarray(bg_rgb), jnp.asarray(fg_rgb),
        jnp.asarray(bg_depth), jnp.asarray(fg_depth), dist,
        threshold=60.0, hsv=True))
    want = np.zeros(mask.shape, bool)
    want[40:80, 60:110] = True
    assert iou(mask, want) > 0.7, iou(mask, want)


def test_build_bs_input_shape_and_normalization():
    bg_rgb, fg_rgb, bg_depth, fg_depth, dist = synth_scene(seed=4)
    x = np.asarray(bgs.build_bs_input(
        jnp.asarray(bg_rgb), jnp.asarray(fg_rgb),
        jnp.asarray(bg_depth), jnp.asarray(fg_depth), dist))
    assert x.shape == (120, 160, 7)
    # identical pixels (background region) -> diff 0 -> (0 - mean)/std
    want_bgval = (0.0 - np.asarray(bgs.BS_MEAN)) / np.asarray(bgs.BS_STD)
    np.testing.assert_allclose(x[0, 0], want_bgval, atol=0.3)
    # object region has strong positive channels
    assert np.abs(x[55, 80]).max() > 1.0


def test_build_bs_input_uint8_wrap_parity():
    # depth differences > 255 must wrap like np.uint8 casting does
    h = w = 8
    bg_rgb = np.zeros((h, w, 3), np.float32)
    fg_rgb = np.zeros((h, w, 3), np.float32)
    bg_depth = np.full((h, w), 700.0, np.float32)
    fg_depth = np.full((h, w), 960.0, np.float32)  # diff 260 -> wraps to 4
    x = np.asarray(bgs.build_bs_input(
        jnp.asarray(bg_rgb), jnp.asarray(fg_rgb),
        jnp.asarray(bg_depth), jnp.asarray(fg_depth), 830.0))
    depth_ch = x[..., 6] * bgs.BS_STD[6] + bgs.BS_MEAN[6]
    np.testing.assert_allclose(depth_ch * 255.0, 4.0, atol=1e-3)
