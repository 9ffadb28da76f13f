"""Iterative closest point registration as a jitted XLA graph.

Replaces Open3D's registration_icp (point-to-point and point-to-plane) used by
the reconstruction pipeline (/root/reference/pc_reconstruction/open3d_utils.py:63-122):
correspondence search via the TPU nearest-neighbor op, rejection beyond
`max_corr_dist`, a closed-form Kabsch/SVD update (point-to-point) or a 6x6
linearized Gauss-Newton step (point-to-plane), with Open3D's convergence
criteria (relative fitness / relative rmse / max_iteration) inside a
`lax.while_loop`. Fixed shapes + masks throughout, so the whole registration
compiles once and runs on-device; `vmap` over the leading axis batches
registrations across runs/objects.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import knn as knn_ops
from ..utils import transforms as T

_HI = jax.lax.Precision.HIGHEST


class ICPResult(NamedTuple):
    transformation: jnp.ndarray  # (4, 4) source -> target
    fitness: jnp.ndarray         # inlier fraction of valid source points
    inlier_rmse: jnp.ndarray     # rmse over inliers
    num_iterations: jnp.ndarray


def _kabsch(src, tgt, weights):
    """Weighted closed-form rigid alignment src -> tgt (Umeyama w/o scale)."""
    w = weights[:, None]
    wsum = jnp.maximum(jnp.sum(weights), 1e-9)
    mu_s = jnp.sum(src * w, axis=0) / wsum
    mu_t = jnp.sum(tgt * w, axis=0) / wsum
    s = src - mu_s
    t = tgt - mu_t
    h = jnp.einsum("ni,nj->ij", s * w, t, precision=_HI)
    u, _, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(jnp.dot(vt.T, u.T, precision=_HI)))
    diag = jnp.diag(jnp.stack([jnp.float32(1.0), jnp.float32(1.0), d]))
    r = jnp.dot(vt.T, jnp.dot(diag, u.T, precision=_HI), precision=_HI)
    t_vec = mu_t - jnp.dot(r, mu_s, precision=_HI)
    return T.make_tf(r, t_vec)


def _point2plane_step(src, tgt, normals, weights):
    """One linearized point-to-plane Gauss-Newton step (6x6 normal equations).

    Residual r_i = n_i . (R s_i + t - q_i); linearized with R ~ I + [w]x.
    """
    c = jnp.cross(src, normals)
    jac = jnp.concatenate([c, normals], axis=1)  # (N, 6)
    res = jnp.sum((src - tgt) * normals, axis=1)  # (N,)
    w = weights[:, None]
    a = jnp.einsum("ni,nj->ij", jac * w, jac, precision=_HI)
    b = -jnp.einsum("ni,n->i", jac * w, res, precision=_HI)
    a = a + jnp.eye(6, dtype=a.dtype) * 1e-9
    x = jnp.linalg.solve(a, b)
    rot = T.euler_to_mat(x[0], x[1], x[2])
    return T.make_tf(rot, x[3:6])


@functools.partial(
    jax.jit,
    static_argnames=("estimation", "max_iterations"),
)
def registration_icp(
    source,
    source_valid,
    target,
    target_valid,
    max_corr_dist,
    init_tf=None,
    estimation: str = "point_to_point",
    max_iterations: int = 100,
    relative_fitness: float = 1e-2,
    relative_rmse: float = 1e-2,
    target_normals=None,
) -> ICPResult:
    """Open3D-parity ICP. source/target are (N, 3)/(M, 3) with validity masks.

    The reference calls this with ICPConvergenceCriteria(1e-2, 1e-2, 100) and
    thresholds 100 / 50 mm (/root/reference/pc_reconstruction/open3d_utils.py:76-78,
    create_pointcloud.py / align_point_clouds call sites).
    """
    src = source.astype(jnp.float32)
    tgt = target.astype(jnp.float32)
    if init_tf is None:
        init_tf = jnp.eye(4, dtype=jnp.float32)
    init_tf = init_tf.astype(jnp.float32)
    if estimation == "point_to_plane" and target_normals is None:
        from . import pointcloud as pc

        target_normals = pc.estimate_normals(tgt, target_valid)

    max_d2 = jnp.float32(max_corr_dist) ** 2
    n_src = jnp.maximum(jnp.sum(source_valid.astype(jnp.float32)), 1.0)

    def correspondences(tf):
        moved = T.apply_tf(tf, src[None])[0]
        idx, d2 = knn_ops.nn(moved, tgt, ref_valid=target_valid)
        inlier = source_valid & (d2 <= max_d2)
        w = inlier.astype(jnp.float32)
        fitness = jnp.sum(w) / n_src
        rmse = jnp.sqrt(jnp.sum(d2 * w) / jnp.maximum(jnp.sum(w), 1e-9))
        return moved, tgt[idx], w, fitness, rmse

    def cond(state):
        tf, it, fitness, rmse, prev_fitness, prev_rmse, done = state
        return (~done) & (it < max_iterations)

    def body(state):
        tf, it, fitness, rmse, prev_fitness, prev_rmse, _ = state
        moved, matched, w, fitness, rmse = correspondences(tf)
        if estimation == "point_to_point":
            delta = _kabsch(moved, matched, w)
        else:
            delta = _point2plane_step(moved, matched, target_normals, w)
        new_tf = jnp.dot(delta, tf, precision=_HI)
        # Open3D's criteria compare the absolute change of fitness and rmse
        # against relative_fitness / relative_rmse directly.
        converged = (
            (jnp.abs(prev_fitness - fitness) < relative_fitness)
            & (jnp.abs(prev_rmse - rmse) < relative_rmse)
        )
        return new_tf, it + 1, fitness, rmse, fitness, rmse, converged

    state = (
        init_tf,
        jnp.int32(0),
        jnp.float32(0.0),
        jnp.float32(jnp.inf),
        jnp.float32(-1.0),
        jnp.float32(jnp.inf),
        jnp.bool_(False),
    )
    tf, it, fitness, rmse, _, _, _ = jax.lax.while_loop(cond, body, state)
    _, _, _, final_fitness, final_rmse = correspondences(tf)
    return ICPResult(tf, final_fitness, final_rmse, it)


def icp_regression(target, target_valid, source, source_valid,
                   voxel_size=5.0, threshold=100.0,
                   icp_point2point: bool = True, icp_point2plane: bool = True,
                   global_regression: bool = False):
    """Parity wrapper for the reference's `icp_regression`
    (/root/reference/pc_reconstruction/open3d_utils.py:63-122): voxel-downsample
    both clouds, optionally FPFH+RANSAC global registration for the initial
    transform (open3d_utils.py:86-96), then point-to-point ICP followed by
    point-to-plane refinement.
    Returns (downsampled target, tvalid, downsampled source, svalid, tf).
    Note the reference registers *source onto target* and returns the tf that
    moves source into the target frame.
    """
    from . import global_registration as greg
    from . import pointcloud as pc

    tgt, tvalid = pc.voxel_downsample(target, target_valid, voxel_size)
    src, svalid = pc.voxel_downsample(source, source_valid, voxel_size)
    tf = jnp.eye(4, dtype=jnp.float32)
    if global_regression:
        res = greg.global_registration(src, svalid, tgt, tvalid, voxel_size)
        tf = res.transformation
    if icp_point2point:
        res = registration_icp(src, svalid, tgt, tvalid, threshold, tf,
                               "point_to_point")
        tf = res.transformation
    if icp_point2plane:
        res = registration_icp(src, svalid, tgt, tvalid, threshold, tf,
                               "point_to_plane")
        tf = res.transformation
    return tgt, tvalid, src, svalid, tf
