"""ICP registration: recover known rigid transforms on synthetic clouds."""
import jax.numpy as jnp
import numpy as np

from autoposeestimation_tpu.ops import icp, pointcloud as pc
from autoposeestimation_tpu.utils import transforms as T


def make_shape(n=400, seed=0):
    """A non-degenerate 3D L-bracket surface."""
    rng = np.random.default_rng(seed)
    a = np.stack([rng.uniform(0, 40, n // 2), rng.uniform(0, 20, n // 2),
                  np.zeros(n // 2)], axis=1)
    b = np.stack([rng.uniform(0, 40, n - n // 2), np.zeros(n - n // 2),
                  rng.uniform(0, 30, n - n // 2)], axis=1)
    return np.concatenate([a, b]).astype(np.float32)


def apply_np(tf, pts):
    return pts @ tf[:3, :3].T + tf[:3, 3]


def test_icp_point2point_recovers_transform():
    src = make_shape()
    true_rot = np.asarray(T.euler_to_mat(jnp.float32(0.05), jnp.float32(-0.08),
                                         jnp.float32(0.1)))
    true_tf = np.eye(4, dtype=np.float32)
    true_tf[:3, :3] = true_rot
    true_tf[:3, 3] = [3.0, -2.0, 1.5]
    tgt = apply_np(true_tf, src)

    s, sv = pc.pad_cloud(src, 512)
    t, tv = pc.pad_cloud(tgt, 512)
    res = icp.registration_icp(jnp.asarray(s), jnp.asarray(sv),
                               jnp.asarray(t), jnp.asarray(tv),
                               max_corr_dist=20.0)
    got = np.asarray(res.transformation)
    moved = apply_np(got, src)
    rmse = np.sqrt(np.mean(np.sum((moved - tgt) ** 2, axis=1)))
    assert rmse < 0.5, rmse
    assert float(res.fitness) > 0.99


def test_icp_point2plane_refines():
    src = make_shape(seed=1)
    true_tf = np.eye(4, dtype=np.float32)
    true_tf[:3, :3] = np.asarray(T.euler_to_mat(jnp.float32(0.03),
                                                jnp.float32(0.02),
                                                jnp.float32(-0.04)))
    true_tf[:3, 3] = [1.0, 0.5, -0.8]
    tgt = apply_np(true_tf, src)

    s, sv = pc.pad_cloud(src, 512)
    t, tv = pc.pad_cloud(tgt, 512)
    res = icp.registration_icp(jnp.asarray(s), jnp.asarray(sv),
                               jnp.asarray(t), jnp.asarray(tv),
                               max_corr_dist=10.0,
                               estimation="point_to_plane",
                               relative_fitness=1e-6, relative_rmse=1e-6)
    moved = apply_np(np.asarray(res.transformation), src)
    rmse = np.sqrt(np.mean(np.sum((moved - tgt) ** 2, axis=1)))
    assert rmse < 0.5, rmse


def test_icp_with_noise_and_partial_overlap():
    rng = np.random.default_rng(2)
    src = make_shape(600, seed=2)
    true_tf = np.eye(4, dtype=np.float32)
    true_tf[:3, :3] = np.asarray(T.euler_to_mat(jnp.float32(0.06),
                                                jnp.float32(0.0),
                                                jnp.float32(0.07)))
    true_tf[:3, 3] = [2.0, 1.0, -1.0]
    tgt = apply_np(true_tf, src) + rng.normal(scale=0.05, size=src.shape)
    tgt = tgt[:500]  # partial overlap

    s, sv = pc.pad_cloud(src, 1024)
    t, tv = pc.pad_cloud(tgt, 1024)
    res = icp.registration_icp(jnp.asarray(s), jnp.asarray(sv),
                               jnp.asarray(t), jnp.asarray(tv),
                               max_corr_dist=15.0)
    got = np.asarray(res.transformation)
    # rotation error
    rot_err = np.arccos(np.clip((np.trace(got[:3, :3].T @ true_tf[:3, :3]) - 1) / 2,
                                -1, 1))
    assert rot_err < 0.02, rot_err
    np.testing.assert_allclose(got[:3, 3], true_tf[:3, 3], atol=0.3)


def test_icp_regression_wrapper():
    src = make_shape(300, seed=3)
    true_tf = np.eye(4, dtype=np.float32)
    true_tf[:3, 3] = [4.0, -1.0, 2.0]
    tgt = apply_np(true_tf, src)
    s, sv = pc.pad_cloud(src, 512)
    t, tv = pc.pad_cloud(tgt, 512)
    _, _, _, _, tf = icp.icp_regression(jnp.asarray(t), jnp.asarray(tv),
                                        jnp.asarray(s), jnp.asarray(sv),
                                        voxel_size=2.0, threshold=50.0)
    moved = apply_np(np.asarray(tf), src)
    rmse = np.sqrt(np.mean(np.sum((moved - tgt) ** 2, axis=1)))
    assert rmse < 1.5, rmse
