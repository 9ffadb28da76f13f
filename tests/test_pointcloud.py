"""Point-cloud ops: voxel grid, outlier removal, mahalanobis, normals."""
import jax.numpy as jnp
import numpy as np

from autoposeestimation_tpu.ops import pointcloud as pc


def make_padded(points, size=None):
    size = size or len(points)
    return pc.pad_cloud(points, size)


def test_voxel_downsample_matches_numpy_golden():
    # golden: same voxelization rule in numpy (floor((p - min)/v), mean per voxel)
    rng = np.random.default_rng(0)
    pts_np = rng.uniform(0, 10, (300, 3)).astype(np.float32)
    voxel = 2.0
    lo = pts_np.min(0)
    ijk = np.floor((pts_np - lo) / voxel).astype(int)
    vox = {}
    for p, key in zip(pts_np, map(tuple, ijk)):
        vox.setdefault(key, []).append(p)
    want = np.sort(np.stack([np.mean(v, axis=0) for v in vox.values()]), axis=0)

    pts, valid = make_padded(pts_np, 512)
    out, ovalid = pc.voxel_downsample(jnp.asarray(pts), jnp.asarray(valid), voxel)
    k = int(np.sum(np.asarray(ovalid)))
    assert k == len(vox)
    got = np.sort(np.asarray(out)[:k], axis=0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_voxel_downsample_count_scaling():
    rng = np.random.default_rng(1)
    pts_np = rng.uniform(0, 100, (2000, 3))
    pts, valid = make_padded(pts_np)
    _, v_small = pc.voxel_downsample(jnp.asarray(pts), jnp.asarray(valid), 5.0)
    _, v_big = pc.voxel_downsample(jnp.asarray(pts), jnp.asarray(valid), 25.0)
    assert int(v_big.sum()) < int(v_small.sum()) <= 2000


def test_radius_outlier_removal():
    rng = np.random.default_rng(2)
    cluster = rng.normal(scale=1.0, size=(200, 3))
    outliers = np.array([[50.0, 50, 50], [-60, 0, 0]])
    pts, valid = make_padded(np.concatenate([cluster, outliers]), 256)
    new_valid = pc.remove_radius_outliers(jnp.asarray(pts), jnp.asarray(valid),
                                          nb_points=5, radius=2.0)
    nv = np.asarray(new_valid)
    assert not nv[200] and not nv[201]      # isolated points dropped
    assert nv[:200].sum() > 150             # bulk survives


def test_statistical_outlier_removal():
    rng = np.random.default_rng(3)
    cluster = rng.normal(scale=1.0, size=(300, 3))
    outliers = rng.normal(scale=1.0, size=(5, 3)) + 30.0
    pts, valid = make_padded(np.concatenate([cluster, outliers]), 512)
    new_valid = pc.remove_statistical_outliers(
        jnp.asarray(pts), jnp.asarray(valid), nb_neighbors=20, std_ratio=2.0)
    nv = np.asarray(new_valid)
    assert nv[:300].sum() > 250
    assert nv[300:305].sum() == 0


def test_aabb_center():
    pts_np = np.array([[0.0, 0, 0], [2, 4, 6], [1, 1, 1]])
    pts, valid = make_padded(pts_np, 8)
    c = np.asarray(pc.aabb_center(jnp.asarray(pts), jnp.asarray(valid)))
    np.testing.assert_allclose(c, [1.0, 2.0, 3.0], atol=1e-6)


def test_mahalanobis_flags_far_points():
    rng = np.random.default_rng(4)
    pts_np = rng.normal(size=(100, 3))
    pts_np[0] = [20, 0, 0]
    pts, valid = make_padded(pts_np)
    m = np.asarray(pc.mahalanobis(jnp.asarray(pts), jnp.asarray(valid)))
    assert m[0] > np.percentile(m[1:], 99)


def test_estimate_normals_plane():
    rng = np.random.default_rng(5)
    xy = rng.uniform(-1, 1, (200, 2))
    pts_np = np.concatenate([xy, np.zeros((200, 1))], axis=1)  # z=0 plane
    pts, valid = make_padded(pts_np, 256)
    normals = np.asarray(pc.estimate_normals(jnp.asarray(pts), jnp.asarray(valid), k=10))
    nz = np.abs(normals[:200, 2])
    assert np.mean(nz > 0.99) > 0.95


def test_voxel_downsample_matches_native_golden():
    from autoposeestimation_tpu.ops import native

    rng = np.random.default_rng(7)
    pts_np = rng.uniform(0, 20, (400, 3)).astype(np.float32)
    want = np.sort(native.voxel_downsample(pts_np, 2.5), axis=0)
    pts, valid = make_padded(pts_np, 512)
    out, ovalid = pc.voxel_downsample(jnp.asarray(pts), jnp.asarray(valid), 2.5)
    k = int(np.sum(np.asarray(ovalid)))
    got = np.sort(np.asarray(out)[:k], axis=0)
    assert k == len(want)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_radius_counts_match_native_golden():
    from autoposeestimation_tpu.ops import native

    rng = np.random.default_rng(8)
    pts_np = rng.normal(size=(200, 3)).astype(np.float32)
    counts = native.radius_neighbor_counts(pts_np, 0.5)
    pts, valid = make_padded(pts_np, 256)
    # replicate the op's internal count via its public keep decision
    for nb in (1, int(np.median(counts))):
        keep = pc.remove_radius_outliers(jnp.asarray(pts), jnp.asarray(valid),
                                         nb, 0.5)
        np.testing.assert_array_equal(np.asarray(keep)[:200], counts >= nb)


def test_mean_knn_dists_match_native_golden():
    from autoposeestimation_tpu.ops import native

    rng = np.random.default_rng(9)
    pts_np = rng.normal(size=(150, 3)).astype(np.float32)
    want = native.mean_knn_dists(pts_np, 10)
    pts, valid = make_padded(pts_np)
    got = np.asarray(pc.mean_knn_dists(jnp.asarray(pts), jnp.asarray(valid), 10))
    np.testing.assert_allclose(got, want, atol=1e-4)
