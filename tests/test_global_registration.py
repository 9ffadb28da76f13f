"""FPFH + parallel RANSAC global registration: the >30-degree case plain ICP
cannot solve (VERDICT round-1 done-criterion), feature invariance, and flag
wiring (global_regression must no longer be a silent no-op)."""
import jax
import jax.numpy as jnp
import numpy as np

from autoposeestimation_tpu.ops import global_registration as greg
from autoposeestimation_tpu.ops import icp as icp_ops
from autoposeestimation_tpu.ops import pointcloud as pc


def bumpy_cloud(n=800, seed=0):
    """Asymmetric blob: ellipsoid with two gaussian bumps (perfect spheres and
    ellipsoids are registration-degenerate)."""
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    a = np.asarray([0.7, 0.5, 0.5])
    a /= np.linalg.norm(a)
    b = np.asarray([-0.2, -0.9, 0.4])
    b /= np.linalg.norm(b)
    r = 20.0 * (1.0 + 0.45 * np.exp(-np.sum((u - a) ** 2, 1) / 0.10)
                + 0.6 * np.exp(-np.sum((u - b) ** 2, 1) / 0.15))
    return (u * r[:, None] * np.asarray([1.0, 0.8, 0.6])).astype(np.float32)


def rot_about(axis, deg):
    axis = np.asarray(axis, np.float64)
    axis /= np.linalg.norm(axis)
    th = np.deg2rad(deg)
    k = np.asarray([[0, -axis[2], axis[1]],
                    [axis[2], 0, -axis[0]],
                    [-axis[1], axis[0], 0]])
    return (np.eye(3) + np.sin(th) * k
            + (1 - np.cos(th)) * (k @ k)).astype(np.float32)


def angle_between(r1, r2):
    c = (np.trace(r1.T @ r2) - 1.0) / 2.0
    return np.rad2deg(np.arccos(np.clip(c, -1.0, 1.0)))


def padded(cloud):
    p, v = pc.pad_bucket(cloud, min_size=1024)
    return jnp.asarray(p), jnp.asarray(v)


def test_fpfh_rotation_invariance():
    cloud = bumpy_cloud()
    r = rot_about([0.2, 0.5, 0.8], 50.0)
    p1, v1 = padded(cloud)
    p2, v2 = padded(cloud @ r.T + np.asarray([5.0, -3.0, 8.0], np.float32))
    f1 = np.asarray(greg.compute_fpfh(p1, v1, jnp.float32(10.0)))
    f2 = np.asarray(greg.compute_fpfh(p2, v2, jnp.float32(10.0)))
    n = len(cloud)
    # same point order: per-point features must match closely (angles are
    # dot products of co-rotated vectors; bins can flip only at bin edges)
    rel = np.linalg.norm(f1[:n] - f2[:n], axis=1) / np.maximum(
        np.linalg.norm(f1[:n], axis=1), 1e-9)
    assert np.median(rel) < 0.05
    assert (rel < 0.25).mean() > 0.9


def test_global_registration_recovers_large_rotation():
    cloud = bumpy_cloud()
    r = rot_about([0.3, 0.5, 0.8], 75.0)
    t = np.asarray([15.0, -10.0, 8.0], np.float32)
    src, sv = padded(cloud)
    tgt, tv = padded(cloud @ r.T + t)

    res = greg.global_registration(src, sv, tgt, tv, voxel_size=2.0)
    assert bool(res.valid)
    got = np.asarray(res.transformation)
    assert angle_between(got[:3, :3], r) < 10.0
    assert np.linalg.norm(got[:3, 3] - t) < 5.0
    assert float(res.fitness) > 0.3


def test_icp_fails_where_global_init_succeeds():
    """The VERDICT done-criterion: >30 deg initial misalignment defeats plain
    p2p ICP; with global_regression=True the same call registers."""
    cloud = bumpy_cloud(seed=1)
    r = rot_about([0.3, 0.5, 0.8], 75.0)
    t = np.asarray([15.0, -10.0, 8.0], np.float32)
    moved_cloud = cloud @ r.T + t
    src, sv = padded(cloud)
    tgt, tv = padded(moved_cloud)

    def final_rmse(global_regression):
        _, _, dsrc, dsv, tf = icp_ops.icp_regression(
            tgt, tv, src, sv, voxel_size=2.0, threshold=100.0,
            icp_point2point=True, icp_point2plane=False,
            global_regression=global_regression)
        tfn = np.asarray(tf)
        # evaluate against the known ground truth on the raw cloud
        out = cloud @ tfn[:3, :3].T + tfn[:3, 3]
        return float(np.sqrt(((out - moved_cloud) ** 2).sum(1)).mean()), tfn

    rmse_plain, tf_plain = final_rmse(False)
    rmse_global, tf_global = final_rmse(True)
    assert rmse_plain > 5.0, f"plain ICP unexpectedly solved it ({rmse_plain})"
    assert rmse_global < 2.0, f"global+ICP failed ({rmse_global})"
    assert angle_between(tf_global[:3, :3], r) < 5.0


def test_ransac_rejects_when_no_structure():
    """Pure-noise clouds: every hypothesis should fail the checks or fit
    poorly; the result must not report high fitness with a wild transform."""
    rng = np.random.default_rng(0)
    a = rng.uniform(-30, 30, (300, 3)).astype(np.float32)
    b = rng.uniform(-30, 30, (300, 3)).astype(np.float32)
    src, sv = padded(a)
    tgt, tv = padded(b)
    res = greg.global_registration(src, sv, tgt, tv, voxel_size=2.0)
    # noise has no consistent rigid map: low fitness expected
    assert float(res.fitness) < 0.5
