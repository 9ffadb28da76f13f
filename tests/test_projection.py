"""Tests for projection ops: backprojection parity with the reference formulas,
bbox quantization parity with get_bbox, and the static choose logic."""
import jax
import jax.numpy as jnp
import numpy as np

from autoposeestimation_tpu.ops import projection as P


INTR = jnp.asarray([600.0, 610.0, 320.0, 240.0], jnp.float32)  # fx fy ppx ppy


def ref_get_bbox(label):
    """Reimplementation of the reference quantized bbox for testing
    (/root/reference/DenseFusion/datasets/myDatasetAugmented/dataset.py:342-380)."""
    border_list = [-1] + list(range(40, 681, 40))
    img_width, img_length = 480, 640
    rows = np.any(label, axis=1)
    cols = np.any(label, axis=0)
    rmin, rmax = np.where(rows)[0][[0, -1]]
    cmin, cmax = np.where(cols)[0][[0, -1]]
    rmax += 1
    cmax += 1
    r_b = rmax - rmin
    for tt in range(len(border_list) - 1):
        if border_list[tt] < r_b < border_list[tt + 1]:
            r_b = border_list[tt + 1]
            break
    c_b = cmax - cmin
    for tt in range(len(border_list) - 1):
        if border_list[tt] < c_b < border_list[tt + 1]:
            c_b = border_list[tt + 1]
            break
    center = [int((rmin + rmax) / 2), int((cmin + cmax) / 2)]
    rmin = center[0] - int(r_b / 2)
    rmax = center[0] + int(r_b / 2)
    cmin = center[1] - int(c_b / 2)
    cmax = center[1] + int(c_b / 2)
    if rmin < 0:
        rmax += -rmin
        rmin = 0
    if cmin < 0:
        cmax += -cmin
        cmin = 0
    if rmax > img_width:
        rmin -= rmax - img_width
        rmax = img_width
    if cmax > img_length:
        cmin -= cmax - img_length
        cmax = img_length
    return rmin, rmax, cmin, cmax


def test_backproject_matches_reference_formula():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, 480, 100), jnp.int32)
    cols = jnp.asarray(rng.integers(0, 640, 100), jnp.int32)
    depth = jnp.asarray(rng.uniform(300, 1200, 100), jnp.float32)
    pts = np.asarray(P.pixels_to_points(rows, cols, depth, INTR))
    fx, fy, ppx, ppy = np.asarray(INTR)
    np.testing.assert_allclose(pts[:, 0], (np.asarray(cols) - ppx) * np.asarray(depth) / fx, rtol=1e-6)
    np.testing.assert_allclose(pts[:, 1], (np.asarray(rows) - ppy) * np.asarray(depth) / fy, rtol=1e-6)
    np.testing.assert_allclose(pts[:, 2], np.asarray(depth), rtol=1e-6)


def test_project_backproject_roundtrip():
    rng = np.random.default_rng(1)
    rows = jnp.asarray(rng.integers(0, 480, 50), jnp.int32)
    cols = jnp.asarray(rng.integers(0, 640, 50), jnp.int32)
    depth = jnp.asarray(rng.uniform(300, 1200, 50), jnp.float32)
    pts = P.pixels_to_points(rows, cols, depth, INTR)
    pix = np.asarray(P.points_to_pixels(pts, INTR))
    np.testing.assert_array_equal(pix[:, 0], np.asarray(rows))
    np.testing.assert_array_equal(pix[:, 1], np.asarray(cols))


def test_depth_to_cloud_shape():
    depth = jnp.ones((480, 640), jnp.float32) * 500
    cloud = P.depth_to_cloud(depth, INTR)
    assert cloud.shape == (480 * 640, 3)
    np.testing.assert_allclose(np.asarray(cloud[:, 2]), 500.0)


def test_get_bbox_parity_random_masks():
    rng = np.random.default_rng(2)
    for _ in range(20):
        mask = np.zeros((480, 640), bool)
        r0, c0 = rng.integers(0, 400), rng.integers(0, 560)
        h, w = rng.integers(5, 80), rng.integers(5, 80)
        mask[r0:r0 + h, c0:c0 + w] = True
        got = tuple(int(v) for v in jax.jit(P.get_bbox)(jnp.asarray(mask)))
        want = ref_get_bbox(mask)
        assert got == want, (got, want)


def test_get_bbox_exact_multiple_of_40():
    mask = np.zeros((480, 640), bool)
    mask[100:140, 200:280] = True  # extents exactly 40 and 80
    got = tuple(int(v) for v in P.get_bbox(jnp.asarray(mask)))
    want = ref_get_bbox(mask)
    assert got == want


def test_choose_subsample_and_wrap():
    key = jax.random.PRNGKey(0)
    win = np.zeros((32, 32), bool)
    win[4:10, 4:10] = True  # 36 valid pixels
    idx, count = P.choose_masked_indices(jnp.asarray(win), 16, key)
    assert int(count) == 36
    flat = win.reshape(-1)
    assert np.all(flat[np.asarray(idx)])
    assert len(np.unique(np.asarray(idx))) == 16  # without replacement
    assert np.all(np.diff(np.asarray(idx)) > 0)  # ascending order

    idx2, count2 = P.choose_masked_indices(jnp.asarray(win), 100, key)
    assert int(count2) == 36
    valid_sorted = np.where(flat)[0]
    np.testing.assert_array_equal(np.asarray(idx2), valid_sorted[np.arange(100) % 36])


def test_backproject_choose_end_to_end():
    rng = np.random.default_rng(3)
    depth = np.zeros((480, 640), np.float32)
    mask = np.zeros((480, 640), bool)
    mask[200:260, 300:360] = True
    depth[200:260, 300:360] = rng.uniform(400, 600, (60, 60))
    r0, c0 = P.fixed_crop_bbox(jnp.asarray(mask), 160)
    cloud, choose, count = P.backproject_choose(
        jnp.asarray(depth), jnp.asarray(mask), INTR, 0.001, r0, c0, 160, 500,
        jax.random.PRNGKey(1))
    assert cloud.shape == (500, 3)
    assert int(count) == 3600
    z = np.asarray(cloud[:, 2])
    assert np.all(z > 0.3) and np.all(z < 0.7)  # meters


def test_fixed_crop_clamps_inside():
    mask = np.zeros((480, 640), bool)
    mask[0:10, 630:640] = True  # corner object
    r0, c0 = P.fixed_crop_bbox(jnp.asarray(mask), 320)
    assert int(r0) == 0 and int(c0) == 320


def test_zoom_window_identity_when_fits():
    """win == crop for masks whose quantized bbox fits: same window as
    fixed_crop_bbox, exact identity resample."""
    rng = np.random.default_rng(0)
    mask = np.zeros((480, 640), bool)
    mask[200:260, 300:350] = True  # 60x50 -> quantized 80x80 <= crop 160
    img = rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
    m = jnp.asarray(mask)
    r0f, c0f = P.fixed_crop_bbox(m, 160)
    r0, c0, win = P.zoom_window_bbox(m, 160)
    assert int(win) == 160
    assert (int(r0), int(c0)) == (int(r0f), int(c0f))
    got = np.asarray(P.resample_window(jnp.asarray(img), r0, c0, win, 160))
    want = np.asarray(P.gather_window(jnp.asarray(img), r0f, c0f, 160))
    np.testing.assert_array_equal(got, want)


def test_zoom_backproject_covers_oversized_mask():
    """Mask extent > crop: the zoom path must sample the WHOLE object (the
    round-1 fixed window truncated it) with exact native-coordinate
    backprojection."""
    h, w, crop = 480, 640, 160
    mask = np.zeros((h, w), bool)
    mask[100:420, 150:500] = True  # 320x350 extent, far beyond crop 160
    depth = np.zeros((h, w), np.float32)
    depth[mask] = 800.0
    intr = jnp.asarray([600.0, 600.0, 320.0, 240.0], jnp.float32)
    m = jnp.asarray(mask)

    r0, c0, win = P.zoom_window_bbox(m, crop)
    assert int(win) > crop
    cloud, choose, count = P.backproject_choose_zoom(
        jnp.asarray(depth), m, intr, jnp.float32(0.001), r0, c0, win, crop,
        512, jax.random.PRNGKey(0))
    assert int(count) == int(mask.sum())
    cloud = np.asarray(cloud)
    # recover native pixels from the exact backprojection and check coverage
    cols = cloud[:, 0] / (cloud[:, 2] / 600.0) + 320.0
    rows = cloud[:, 1] / (cloud[:, 2] / 600.0) + 240.0
    assert rows.max() - rows.min() > crop  # spans more than the static crop
    assert cols.max() - cols.min() > crop
    assert np.all(np.abs(cloud[:, 2] - 0.8) < 1e-6)
    # all rounded pixels must lie inside the true mask
    ri = np.clip(np.round(rows).astype(int), 0, h - 1)
    ci = np.clip(np.round(cols).astype(int), 0, w - 1)
    assert mask[ri, ci].all()
    ch = np.asarray(choose)
    assert ch.min() >= 0 and ch.max() < crop * crop


def test_zoom_choose_maps_to_resampled_grid():
    """choose indices must address the pixel of the resampled crop whose
    source pixel is (close to) the chosen native pixel."""
    h, w, crop = 480, 640, 160
    mask = np.zeros((h, w), bool)
    mask[50:450, 100:560] = True
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    depth = np.full((h, w), 700.0, np.float32)
    intr = jnp.asarray([600.0, 600.0, 320.0, 240.0], jnp.float32)
    m = jnp.asarray(mask)
    r0, c0, win = P.zoom_window_bbox(m, crop)
    cloud, choose, count = P.backproject_choose_zoom(
        jnp.asarray(depth), m, intr, jnp.float32(0.001), r0, c0, win, crop,
        256, jax.random.PRNGKey(1))
    cloud = np.asarray(cloud)
    cols = np.round(cloud[:, 0] / (cloud[:, 2] / 600.0) + 320.0).astype(int)
    rows = np.round(cloud[:, 1] / (cloud[:, 2] / 600.0) + 240.0).astype(int)
    ch = np.asarray(choose)
    r0n, c0n, winn = int(r0), int(c0), int(win)
    # the resampled grid cell addressed by choose must source a pixel within
    # one resample stride (ceil(win/crop)) of the chosen native pixel
    src_r = r0n + (ch // crop) * winn // crop
    src_c = c0n + (ch % crop) * winn // crop
    stride = -(-winn // crop)
    assert np.abs(src_r - rows).max() <= stride
    assert np.abs(src_c - cols).max() <= stride


def test_zoom_window_np_twin_parity():
    """zoom_window_bbox_np (host/dataset path) must equal the jitted
    zoom_window_bbox (serving path) for every mask — a one-pixel window
    disagreement is a silent train/serve skew."""
    rng = np.random.default_rng(11)
    h, w = 128, 160
    for trial in range(40):
        mask = np.zeros((h, w), bool)
        n_blobs = rng.integers(1, 3)
        for _ in range(n_blobs):
            r = rng.integers(0, h)
            c = rng.integers(0, w)
            rh = rng.integers(1, 90)
            rw_ = rng.integers(1, 90)
            mask[max(r - rh // 2, 0):r + rh // 2 + 1,
                 max(c - rw_ // 2, 0):c + rw_ // 2 + 1] = True
        for crop in (32, 64):
            r0j, c0j, winj = P.zoom_window_bbox(
                jnp.asarray(mask), crop, h, w)
            r0n, c0n, winn = P.zoom_window_bbox_np(mask, crop, h, w)
            assert (int(r0j), int(c0j), int(winj)) == (r0n, c0n, winn), (
                trial, crop, (int(r0j), int(c0j), int(winj)),
                (r0n, c0n, winn))
