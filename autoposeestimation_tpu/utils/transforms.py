"""Rigid-transform algebra: quaternions, axis-angle, euler, 4x4 homogeneous TFs.

Replaces the reference's vendored Gohlke `transformations.py` and its
`transforms3d` usage (see /root/reference/DenseFusion/lib/transformations.py and
/root/reference/pipeline/utils.py:381-408). All functions are pure jnp and jit/vmap
safe; they accept and return arrays with arbitrary leading batch dimensions.

Conventions (matching the reference):
  * quaternions are (w, x, y, z), rotations are active,
  * euler angles use the 'sxyz' static convention (transforms3d default),
  * homogeneous transforms are 4x4 row-major with translation in the last column.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Rigid-transform math is tiny but accuracy-critical: always run the 3x3/4x4
# contractions at full f32 precision (TPU would otherwise default to bf16 MXU
# passes, which costs ~5e-3 error on rotation products).
_HI = jax.lax.Precision.HIGHEST


def quat_normalize(q, eps: float = 1e-12):
    """Normalize quaternion(s) (..., 4) to unit length."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_mat(q):
    """Quaternion(s) (..., 4) (w,x,y,z) -> rotation matrix (..., 3, 3).

    Same 9-term expansion as the reference pose loss
    (/root/reference/DenseFusion/lib/loss.py:18-26).

    The normalization floor is 1e-3 (not machine-eps): the gradient of
    q/||q|| scales as 1/||q||, and this function sits inside the pose loss
    where the network emits thousands of UNNORMALIZED candidate quats per
    step — one candidate drifting through ||q|| ~ 1e-5 would inject a ~1e5x
    gradient spike into the whole batch. The floor bounds that amplification
    at 1e3 while leaving every ||q|| > 1e-3 input (all real rotations)
    bit-identical.
    """
    q = quat_normalize(q, eps=1e-3)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (w * y + x * z)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (w * x + y * z)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def mat_to_quat(m):
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4) (w,x,y,z).

    Branch-free Shepperd variant: computes all four candidate quaternions and
    selects the numerically best one by the largest diagonal combination, so it
    is jit/vmap safe (no data-dependent Python control flow).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four candidates, each valid when its pivot term is the largest.
    tw = 1.0 + m00 + m11 + m22  # 4w^2
    tx = 1.0 + m00 - m11 - m22  # 4x^2
    ty = 1.0 - m00 + m11 - m22  # 4y^2
    tz = 1.0 - m00 - m11 + m22  # 4z^2

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-24))

    qw = jnp.stack(
        [tw, m21 - m12, m02 - m20, m10 - m01], axis=-1
    ) / (2.0 * safe_sqrt(tw))[..., None]
    qx = jnp.stack(
        [m21 - m12, tx, m01 + m10, m02 + m20], axis=-1
    ) / (2.0 * safe_sqrt(tx))[..., None]
    qy = jnp.stack(
        [m02 - m20, m01 + m10, ty, m12 + m21], axis=-1
    ) / (2.0 * safe_sqrt(ty))[..., None]
    qz = jnp.stack(
        [m10 - m01, m02 + m20, m12 + m21, tz], axis=-1
    ) / (2.0 * safe_sqrt(tz))[..., None]

    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    scores = jnp.stack([tw, tx, ty, tz], axis=-1)  # (..., 4)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].astype(jnp.int32)
                            .repeat(4, axis=-1), axis=-2)[..., 0, :]
    # Canonical sign: w >= 0 (matches Gohlke's quaternion_from_matrix(isprecise)).
    sign = jnp.where(q[..., :1] < 0.0, -1.0, 1.0)
    return quat_normalize(q * sign)


def quat_multiply(q1, q2):
    """Hamilton product of quaternions (..., 4), (w,x,y,z)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def axangle_to_mat(axis, angle):
    """Axis-angle -> rotation matrix. `axis` (..., 3) need not be unit length.

    Replaces transforms3d.axangles.axangle2mat as used by the robot-pose path
    (/root/reference/pipeline/utils.py:390).
    """
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    C = 1.0 - c
    rows = [
        jnp.stack([x * x * C + c, x * y * C - z * s, x * z * C + y * s], axis=-1),
        jnp.stack([y * x * C + z * s, y * y * C + c, y * z * C - x * s], axis=-1),
        jnp.stack([z * x * C - y * s, z * y * C + x * s, z * z * C + c], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rotvec_to_mat(rv):
    """Rotation vector (axis * angle, (..., 3)) -> rotation matrix.

    This is the UR robot pose convention: the reference converts
    (a, b, c) -> angle = |r|, axis = r/|r| (/root/reference/pipeline/utils.py:385-390).
    Safe at the identity (angle -> 0).
    """
    angle = jnp.linalg.norm(rv, axis=-1)
    safe_axis = jnp.where(
        angle[..., None] > 1e-12, rv, jnp.asarray([1.0, 0.0, 0.0], dtype=rv.dtype)
    )
    return axangle_to_mat(safe_axis, angle)


def mat_to_rotvec(m):
    """Rotation matrix -> rotation vector (axis * angle)."""
    q = mat_to_quat(m)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    angle = 2.0 * jnp.arccos(w)
    sin_half = jnp.sqrt(jnp.maximum(1.0 - w * w, 1e-24))
    axis = q[..., 1:] / sin_half[..., None]
    return jnp.where(angle[..., None] > 1e-7, axis * angle[..., None], q[..., 1:] * 2.0)


def euler_to_mat(ai, aj, ak):
    """Static-frame XYZ euler angles -> rotation matrix (transforms3d 'sxyz').

    R = Rz(ak) @ Ry(aj) @ Rx(ai). Used by the pose-label fitter
    (/root/reference/label_generator/create_labels.py:368-385) and the rotation
    augmentation (/root/reference/DenseFusion/datasets/myDatasetAugmented/dataset.py:211).
    """
    ci, si = jnp.cos(ai), jnp.sin(ai)
    cj, sj = jnp.cos(aj), jnp.sin(aj)
    ck, sk = jnp.cos(ak), jnp.sin(ak)
    rx = jnp.stack(
        [
            jnp.stack([jnp.ones_like(ci), jnp.zeros_like(ci), jnp.zeros_like(ci)], -1),
            jnp.stack([jnp.zeros_like(ci), ci, -si], -1),
            jnp.stack([jnp.zeros_like(ci), si, ci], -1),
        ],
        -2,
    )
    ry = jnp.stack(
        [
            jnp.stack([cj, jnp.zeros_like(cj), sj], -1),
            jnp.stack([jnp.zeros_like(cj), jnp.ones_like(cj), jnp.zeros_like(cj)], -1),
            jnp.stack([-sj, jnp.zeros_like(cj), cj], -1),
        ],
        -2,
    )
    rz = jnp.stack(
        [
            jnp.stack([ck, -sk, jnp.zeros_like(ck)], -1),
            jnp.stack([sk, ck, jnp.zeros_like(ck)], -1),
            jnp.stack([jnp.zeros_like(ck), jnp.zeros_like(ck), jnp.ones_like(ck)], -1),
        ],
        -2,
    )
    return jnp.matmul(rz, jnp.matmul(ry, rx, precision=_HI), precision=_HI)


def mat_to_euler(m):
    """Rotation matrix -> static-frame XYZ euler angles (ai, aj, ak)."""
    sj = -m[..., 2, 0]
    cj = jnp.sqrt(jnp.maximum(m[..., 0, 0] ** 2 + m[..., 1, 0] ** 2, 1e-24))
    aj = jnp.arctan2(sj, cj)
    near_gimbal = cj < 1e-7
    ai = jnp.where(
        near_gimbal,
        jnp.arctan2(-m[..., 1, 2], m[..., 1, 1]),
        jnp.arctan2(m[..., 2, 1], m[..., 2, 2]),
    )
    ak = jnp.where(near_gimbal, 0.0, jnp.arctan2(m[..., 1, 0], m[..., 0, 0]))
    return ai, aj, ak


def make_tf(rot=None, trans=None):
    """Build a homogeneous 4x4 transform from a rotation matrix and translation."""
    batch = ()
    dtype = jnp.float32
    if rot is not None:
        rot = jnp.asarray(rot)
        batch, dtype = rot.shape[:-2], rot.dtype
    elif trans is not None:
        trans = jnp.asarray(trans)
        batch, dtype = trans.shape[:-1], trans.dtype
    tf = jnp.broadcast_to(jnp.eye(4, dtype=dtype), batch + (4, 4))
    if rot is not None:
        tf = tf.at[..., :3, :3].set(rot)
    if trans is not None:
        tf = tf.at[..., :3, 3].set(trans)
    return tf


def tf_inverse(tf):
    """Invert homogeneous transform(s) (..., 4, 4) exploiting rigid structure."""
    r = tf[..., :3, :3]
    t = tf[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", rt, t, precision=_HI)
    return make_tf(rt, ti)


def apply_tf(tf, points):
    """Apply transform(s) (..., 4, 4) to points (..., N, 3)."""
    r = tf[..., :3, :3]
    t = tf[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", r, points, precision=_HI) + t[..., None, :]


def pose_to_tf(quat, trans):
    """(w,x,y,z) quaternion + translation -> 4x4 transform."""
    return make_tf(quat_to_mat(quat), trans)


def compose_quat_poses(q1, t1, q2, t2):
    """Compose two (quat, trans) poses: result = pose1 @ pose2.

    Mirrors the refiner's pose composition
    (/root/reference/DenseFusion/tools/utils.py:20-40).
    """
    r1 = quat_to_mat(q1)
    t = jnp.einsum("...ij,...j->...i", r1, t2, precision=_HI) + t1
    q = quat_multiply(q1, q2)
    return quat_normalize(q), t
