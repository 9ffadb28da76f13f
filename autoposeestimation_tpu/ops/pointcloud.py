"""Point-cloud primitives as jittable static-shape ops.

Replaces the Open3D (C++) calls in the reconstruction stack
(/root/reference/pc_reconstruction/open3d_utils.py,
/root/reference/pc_reconstruction/create_pointcloud.py): voxel downsampling,
radius / statistical outlier removal, Mahalanobis distances, AABB centers.

Variable-size clouds are (N, 3) arrays + boolean validity masks; every op
returns the same padded shape plus an updated mask, so chains of cloud ops
compile once. `compact` (host helper) trims to the valid prefix when a numpy
result is wanted.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import knn as knn_ops

_HI = jax.lax.Precision.HIGHEST


def compact(points, valid):
    """Host-side: gather valid points to a dense numpy (K, 3) array."""
    import numpy as np

    points = np.asarray(points)
    valid = np.asarray(valid)
    return points[valid]


@jax.jit
def aabb_center(points, valid):
    """Axis-aligned bounding-box midpoint of the valid points.

    Parity with `get_my_source_center`
    (/root/reference/pc_reconstruction/open3d_utils.py:273-292).
    """
    big = jnp.float32(jnp.inf)
    lo = jnp.min(jnp.where(valid[:, None], points, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], points, -big), axis=0)
    return lo + (hi - lo) / 2.0


@jax.jit
def centroid(points, valid):
    w = valid.astype(points.dtype)[:, None]
    return jnp.sum(points * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)


@jax.jit
def voxel_downsample(points, valid, voxel_size):
    """Voxel-grid downsample, averaging points per voxel (Open3D semantics:
    voxel ids from floor((p - min_bound) / voxel_size), output point = mean of
    the voxel's points).

    Returns (out_points (N, 3), out_valid (N,)) where the first K entries are
    the voxel means ordered by voxel id; K = out_valid.sum().
    """
    n = points.shape[0]
    pts = points.astype(jnp.float32)
    lo = jnp.min(jnp.where(valid[:, None], pts, jnp.inf), axis=0)
    ijk = jnp.floor((pts - lo) / voxel_size).astype(jnp.int32)
    ijk = jnp.clip(ijk, 0, 2 ** 20 - 1)
    # lexicographic voxel sort (invalid points last); avoids packing the three
    # 20-bit axes into one key, which would overflow without x64
    order = jnp.lexsort((ijk[:, 2], ijk[:, 1], ijk[:, 0], ~valid))
    sijk = ijk[order]
    spts = pts[order]
    svalid = valid[order]

    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(sijk[1:] != sijk[:-1], axis=1)]) & svalid
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # 0..K-1 for valid entries
    seg = jnp.where(svalid, seg, n - 1)  # dump invalid into the last segment

    sums = jax.ops.segment_sum(
        jnp.where(svalid[:, None], spts, 0.0), seg, num_segments=n)
    counts = jax.ops.segment_sum(svalid.astype(jnp.float32), seg, num_segments=n)
    k = jnp.sum(is_new.astype(jnp.int32))
    out_valid = jnp.arange(n) < k
    out = sums / jnp.maximum(counts, 1.0)[:, None]
    return jnp.where(out_valid[:, None], out, 0.0), out_valid


@jax.jit
def remove_radius_outliers(points, valid, nb_points, radius):
    """Keep points having at least nb_points neighbors (incl. self — Open3D
    counts the point itself) within `radius`. Returns updated validity only
    (points unchanged), matching remove_radius_outlier semantics."""
    pts = points.astype(jnp.float32)
    n = pts.shape[0]
    chunk = min(n, 1024)
    pad = (-n) % chunk
    qpad = jnp.pad(pts, ((0, pad), (0, 0)))
    r2 = jnp.float32(radius) ** 2

    def one(qb):
        qq = jnp.sum(qb * qb, axis=1, keepdims=True)
        rr = jnp.sum(pts * pts, axis=1)[None, :]
        d2 = qq + rr - 2.0 * jnp.dot(qb, pts.T, precision=_HI)
        within = (d2 <= r2) & valid[None, :]
        return jnp.sum(within.astype(jnp.int32), axis=1)

    counts = jax.lax.map(one, qpad.reshape(-1, chunk, 3)).reshape(-1)[:n]
    return valid & (counts >= nb_points)


@functools.partial(jax.jit, static_argnames=("nb_neighbors",))
def mean_knn_dists(points, valid, nb_neighbors: int):
    """Mean distance from each valid point to its nb_neighbors nearest
    neighbors (excluding itself)."""
    _, dist = knn_ops.knn_k(points, points, nb_neighbors + 1, ref_valid=valid)
    d = dist[:, 1:]  # drop self
    return jnp.mean(d, axis=1)


@functools.partial(jax.jit, static_argnames=("nb_neighbors",))
def remove_statistical_outliers(points, valid, nb_neighbors: int, std_ratio):
    """Open3D remove_statistical_outlier: drop points whose mean kNN distance
    exceeds mean + std_ratio * std over the cloud."""
    d = mean_knn_dists(points, valid, nb_neighbors)
    w = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mu = jnp.sum(d * w) / n
    var = jnp.sum(w * (d - mu) ** 2) / n
    thresh = mu + std_ratio * jnp.sqrt(jnp.maximum(var, 0.0))
    return valid & (d <= thresh)


@jax.jit
def mahalanobis(points, valid):
    """Per-point Mahalanobis distance to the cloud's own distribution
    (compute_mahalanobis_distance parity; the reference uses its std as the
    std_ratio for statistical outlier removal, open3d_utils.py:200-211)."""
    pts = points.astype(jnp.float32)
    w = valid.astype(jnp.float32)[:, None]
    n = jnp.maximum(jnp.sum(w), 1.0)
    mu = jnp.sum(pts * w, axis=0) / n
    centered = (pts - mu) * w
    cov = jnp.dot(centered.T, centered, precision=_HI) / n
    cov = cov + jnp.eye(3, dtype=jnp.float32) * 1e-9
    inv = jnp.linalg.inv(cov)
    d = pts - mu
    m2 = jnp.einsum("ni,ij,nj->n", d, inv, d, precision=_HI)
    return jnp.sqrt(jnp.maximum(m2, 0.0)) * valid.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("k",))
def estimate_normals(points, valid, k: int = 30):
    """Per-point normals via PCA of the k-NN neighborhood (smallest eigenvector
    of the neighborhood covariance). Open3D estimate_normals equivalent
    (orientation is not globally consistent, as in Open3D without orientation
    propagation — the point-to-plane residual squares it away)."""
    pts = points.astype(jnp.float32)
    idx, _ = knn_ops.knn_k(pts, pts, k, ref_valid=valid)
    nbrs = pts[idx]  # (N, k, 3)
    mu = jnp.mean(nbrs, axis=1, keepdims=True)
    c = nbrs - mu
    cov = jnp.einsum("nki,nkj->nij", c, c, precision=_HI) / k
    _, vecs = jnp.linalg.eigh(cov)  # ascending eigenvalues
    return vecs[:, :, 0]


def intersect_line_line(p1, d1, p2, d2):
    """Closest points between two lines (point, direction) — the
    mathutils.geometry.intersect_line_line replacement used by the
    triangulation path (/root/reference/pc_reconstruction/open3d_utils.py:295-329).
    Inputs may be (3,) or batched (..., 3); returns (point_on_line1,
    point_on_line2)."""
    d1 = d1 / jnp.maximum(jnp.linalg.norm(d1, axis=-1, keepdims=True), 1e-12)
    d2 = d2 / jnp.maximum(jnp.linalg.norm(d2, axis=-1, keepdims=True), 1e-12)
    r = p1 - p2
    a = jnp.sum(d1 * d1, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    c = jnp.sum(d2 * d2, axis=-1)
    d = jnp.sum(d1 * r, axis=-1)
    e = jnp.sum(d2 * r, axis=-1)
    denom = a * c - b * b
    t1 = jnp.where(jnp.abs(denom) > 1e-12, (b * e - c * d) / denom, 0.0)
    t2 = jnp.where(jnp.abs(denom) > 1e-12, (a * e - b * d) / denom, 0.0)
    return p1 + t1[..., None] * d1, p2 + t2[..., None] * d2


def triangulate_position(origins, directions):
    """`get_new_position`-style triangulation: intersect every line pair
    (camera ray toward the observed object center per view) and average the
    midpoints (open3d_utils.py:317-326). origins/directions (V, 3)."""
    v = origins.shape[0]
    ii, jj = jnp.triu_indices(v, k=1)
    a1, a2 = intersect_line_line(origins[ii], directions[ii],
                                 origins[jj], directions[jj])
    midpoints = a1 + (a2 - a1) / 2.0
    return jnp.mean(midpoints, axis=0)


def pad_bucket(points, min_size: int = 1024):
    """Host helper: pad to the next power-of-two bucket >= min_size so chains
    of cloud ops hit a bounded set of compiled shapes."""
    import numpy as np

    n = max(len(points), 1)
    size = min_size
    while size < n:
        size *= 2
    return pad_cloud(np.asarray(points, np.float32), size)


def pad_cloud(points, size: int):
    """Host helper: pad an (K, 3) array to (size, 3) + validity mask."""
    import numpy as np

    points = np.asarray(points, np.float32)
    k = len(points)
    if k > size:
        raise ValueError(f"cloud of {k} points exceeds static size {size}")
    out = np.zeros((size, 3), np.float32)
    out[:k] = points
    valid = np.zeros(size, bool)
    valid[:k] = True
    return out, valid
