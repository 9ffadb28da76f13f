"""Golden tests for the rigid-transform algebra (utils/transforms.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoposeestimation_tpu.utils import transforms as T


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_roundtrip():
    q = jnp.asarray(random_quats(64), jnp.float32)
    q = jnp.where(q[:, :1] < 0, -q, q)  # canonical sign
    m = T.quat_to_mat(q)
    q2 = T.mat_to_quat(m)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-5)


def test_quat_to_mat_is_rotation():
    q = jnp.asarray(random_quats(32, seed=1), jnp.float32)
    m = T.quat_to_mat(q)
    eye = jnp.einsum("bij,bkj->bik", m, m)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(m)), np.ones(32), atol=1e-5)


def test_quat_to_mat_known_values():
    # 90 deg about z: (w,x,y,z) = (cos45, 0, 0, sin45)
    q = jnp.asarray([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)], jnp.float32)
    m = np.asarray(T.quat_to_mat(q))
    expected = np.asarray([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(m, expected, atol=1e-6)


def test_quat_multiply_matches_matrix_product():
    qa = jnp.asarray(random_quats(16, 2), jnp.float32)
    qb = jnp.asarray(random_quats(16, 3), jnp.float32)
    m = T.quat_to_mat(T.quat_multiply(qa, qb))
    m2 = T.quat_to_mat(qa) @ T.quat_to_mat(qb)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)


def test_axangle():
    m = np.asarray(T.axangle_to_mat(jnp.asarray([0.0, 0.0, 2.0]), jnp.asarray(np.pi / 2)))
    expected = np.asarray([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(m, expected, atol=1e-6)


def test_rotvec_roundtrip():
    rng = np.random.default_rng(4)
    rv = rng.normal(size=(32, 3))
    # canonical range: |angle| < pi (beyond that the representation wraps)
    rv = rv / np.linalg.norm(rv, axis=-1, keepdims=True) * rng.uniform(0.01, 3.1, (32, 1))
    rv = jnp.asarray(rv, jnp.float32)
    m = T.rotvec_to_mat(rv)
    rv2 = T.mat_to_rotvec(m)
    np.testing.assert_allclose(np.asarray(rv2), np.asarray(rv), atol=1e-3)


def test_rotvec_above_pi_equivalent_rotation():
    rv = jnp.asarray([0.0, 0.0, 5.0], jnp.float32)  # angle > pi
    m = T.rotvec_to_mat(rv)
    m2 = T.rotvec_to_mat(T.mat_to_rotvec(m))
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)


def test_rotvec_identity_safe():
    m = np.asarray(T.rotvec_to_mat(jnp.zeros(3)))
    np.testing.assert_allclose(m, np.eye(3), atol=1e-6)


def test_euler_roundtrip():
    rng = np.random.default_rng(5)
    ai, aj, ak = [jnp.asarray(rng.uniform(-1.2, 1.2, 16), jnp.float32) for _ in range(3)]
    m = T.euler_to_mat(ai, aj, ak)
    ai2, aj2, ak2 = T.mat_to_euler(m)
    np.testing.assert_allclose(np.asarray(ai2), np.asarray(ai), atol=1e-4)
    np.testing.assert_allclose(np.asarray(aj2), np.asarray(aj), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ak2), np.asarray(ak), atol=1e-4)


def test_euler_composition_order():
    # sxyz: R = Rz @ Ry @ Rx
    ai, aj, ak = 0.3, -0.2, 0.7
    m = np.asarray(T.euler_to_mat(jnp.float32(ai), jnp.float32(aj), jnp.float32(ak)))
    rx = np.asarray(T.axangle_to_mat(jnp.asarray([1.0, 0, 0]), jnp.float32(ai)))
    ry = np.asarray(T.axangle_to_mat(jnp.asarray([0.0, 1, 0]), jnp.float32(aj)))
    rz = np.asarray(T.axangle_to_mat(jnp.asarray([0.0, 0, 1]), jnp.float32(ak)))
    np.testing.assert_allclose(m, rz @ ry @ rx, atol=1e-5)


def test_tf_inverse_and_apply():
    rng = np.random.default_rng(6)
    q = jnp.asarray(random_quats(8, 7), jnp.float32)
    t = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    tf = T.pose_to_tf(q, t)
    inv = T.tf_inverse(tf)
    eye = np.asarray(jnp.einsum("bij,bjk->bik", tf, inv))
    np.testing.assert_allclose(eye, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)

    pts = jnp.asarray(rng.normal(size=(8, 10, 3)), jnp.float32)
    out = T.apply_tf(tf, pts)
    back = T.apply_tf(inv, out)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_compose_quat_poses():
    qa = jnp.asarray(random_quats(4, 8), jnp.float32)
    qb = jnp.asarray(random_quats(4, 9), jnp.float32)
    rng = np.random.default_rng(10)
    ta = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    tb = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    qc, tc = T.compose_quat_poses(qa, ta, qb, tb)
    tf = np.asarray(T.pose_to_tf(qa, ta)) @ np.asarray(T.pose_to_tf(qb, tb))
    np.testing.assert_allclose(np.asarray(T.quat_to_mat(qc)), tf[:, :3, :3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), tf[:, :3, 3], atol=1e-5)


def test_jit_and_vmap():
    q = jnp.asarray(random_quats(8), jnp.float32)
    jit_m = jax.jit(T.quat_to_mat)(q)
    vmap_m = jax.vmap(T.quat_to_mat)(q)
    np.testing.assert_allclose(np.asarray(jit_m), np.asarray(vmap_m), atol=1e-6)
