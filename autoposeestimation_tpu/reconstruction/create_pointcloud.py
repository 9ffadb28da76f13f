"""Multi-view object point-cloud reconstruction.

TPU rebuild of /root/reference/pc_reconstruction/create_pointcloud.py: the
per-pixel Python backprojection loop of `get_surface` (open3d_utils.py:179-192)
becomes a jitted masked-backprojection + the cloud-op chain (voxel downsample,
radius + statistical outlier removal) on device; ICP merging uses ops/icp.
Host code only orchestrates file IO and the variable-size -> padded-bucket
conversion.

Pipeline per object (load_point_cloud):
  per run: select n_viewpoints by viewpoint voxel search (get_view_distribution
  parity incl. the greedy nearest-neighbor ordering), backproject+clean each
  view's surface, incrementally ICP-merge + voxel downsample; rotate the merged
  run cloud by its object_pose rotation about its center; across runs
  align_point_clouds (y-nudge + ICP + outlier removal); write <run>.ply/.pcd,
  <obj>_out.ply, <obj>.ply (AABB-centered, voxel_size_out) and <obj>.xyz
  (downsampled below 1000 points by voxel-size search).
All geometry in robot-frame mm, matching the on-disk contract.
"""
from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import icp as icp_ops
from ..ops import pointcloud as pc
from ..ops import projection as proj
from ..utils import io


def _np_voxel_count(points: np.ndarray, voxel: float) -> int:
    lo = points.min(axis=0)
    ijk = np.floor((points - lo) / voxel).astype(np.int64)
    return len(np.unique(ijk, axis=0))


def _np_voxel_centroids(points: np.ndarray, voxel: float) -> np.ndarray:
    lo = points.min(axis=0)
    ijk = np.floor((points - lo) / voxel).astype(np.int64)
    _, inv = np.unique(ijk, axis=0, return_inverse=True)
    k = inv.max() + 1
    sums = np.zeros((k, 3))
    counts = np.zeros(k)
    np.add.at(sums, inv, points)
    np.add.at(counts, inv, 1)
    return sums / counts[:, None]


def get_view_distribution(data_path: str, run: str, n: int, n_viewpoints: int,
                          rng: Optional[np.random.Generator] = None
                          ) -> np.ndarray:
    """Select n_viewpoints sample indices whose camera positions cover the
    view sphere (create_pointcloud.py:46-174 parity): voxel-downsample the
    camera-position set searching the voxel size that yields exactly
    n_viewpoints, map back to nearest originals, then greedy nearest-neighbor
    ordering starting from the min-norm position."""
    rng = rng or np.random.default_rng(0)
    points = []
    for idx in range(n):
        meta = io.read_sample_meta(
            os.path.join(data_path, run, f"{idx:06d}.meta.json"))
        points.append(io.robot2cam_from_meta(meta)[:3, 3])
    points = np.asarray(points)
    if n <= n_viewpoints:
        order = [int(np.argmin(np.linalg.norm(points, axis=1)))]
        while len(order) < n:
            last = points[order[-1]]
            rest = [j for j in range(n) if j not in order]
            order.append(min(rest, key=lambda j: np.linalg.norm(
                points[j] - last)))
        return np.asarray(order)

    # initial voxel = min pairwise distance (int), then +-1 search
    d2 = np.linalg.norm(points[:, None] - points[None, :], axis=-1)
    np.fill_diagonal(d2, np.inf)
    voxel = max(int(d2.min()), 1)
    while True:
        k = _np_voxel_count(points, voxel)
        if k == n_viewpoints:
            selected = _np_voxel_centroids(points, voxel)
            break
        if k < n_viewpoints:
            voxel -= 1
            if voxel <= 0:
                selected = points[rng.choice(n, n_viewpoints, replace=False)]
                break
            cents = _np_voxel_centroids(points, voxel)
            pick = rng.choice(len(cents), size=n_viewpoints, replace=False)
            selected = cents[pick]
            break
        voxel += 1

    selection = [int(np.argmin(np.linalg.norm(points - p, axis=1)))
                 for p in selected]
    sel_points = points[selection]
    order = [int(np.argmin(np.linalg.norm(sel_points, axis=1)))]
    while len(order) < n_viewpoints:
        last = sel_points[order[-1]]
        rest = [j for j in range(n_viewpoints) if j not in order]
        order.append(min(rest, key=lambda j: np.linalg.norm(
            sel_points[j] - last)))
    return np.asarray(selection)[order]


def _masked_std(x, valid):
    """Population std over the valid entries only (np.std semantics on the
    real points — padding must not shrink the spread)."""
    w = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mu = jnp.sum(x * w) / n
    return jnp.sqrt(jnp.maximum(jnp.sum(w * (x - mu) ** 2) / n, 0.0))


def _clean_chain(pts, valid, min_friends, min_dist, nb_neighbors):
    """Radius + statistical outlier removal with the Mahalanobis-std ratio
    (open3d_utils.py:195-213), shared by the per-view and batched paths."""
    valid = pc.remove_radius_outliers(pts, valid, min_friends, min_dist)
    maha = pc.mahalanobis(pts, valid)
    std_ratio = _masked_std(maha, valid)
    valid = pc.remove_statistical_outliers(pts, valid, nb_neighbors,
                                           jnp.maximum(std_ratio, 1e-6))
    return valid


def get_surface(label: np.ndarray, depth: np.ndarray, intr, robot2cam,
                min_friends: int, min_dist: float, nb_neighbors: int,
                voxel_size: float) -> np.ndarray:
    """Masked backprojection to robot frame + voxel downsample + radius and
    statistical outlier removal (open3d_utils.py:171-213) — the reference's
    per-pixel Python loop, vectorized and run on device."""
    mask = (label != 0) & (depth != 0)
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return np.zeros((0, 3))
    z = depth[ys, xs].astype(np.float32)
    intr_vec = intr.as_array() if hasattr(intr, "as_array") else np.asarray(
        [intr["fx"], intr["fy"], intr["ppx"], intr["ppy"]], np.float32)
    cam = np.asarray(proj.pixels_to_points(
        jnp.asarray(ys), jnp.asarray(xs), jnp.asarray(z),
        jnp.asarray(intr_vec)))
    robot = cam @ np.asarray(robot2cam)[:3, :3].T + np.asarray(robot2cam)[:3, 3]

    pts, valid = pc.pad_bucket(robot)
    pts = jnp.asarray(pts)
    valid = jnp.asarray(valid)
    pts, valid = pc.voxel_downsample(pts, valid, voxel_size)
    valid = _clean_chain(pts, valid, min_friends, min_dist, nb_neighbors)
    return pc.compact(pts, valid)


@functools.partial(jax.jit,
                   static_argnames=("cap", "min_friends", "nb_neighbors"))
def _surfaces_batched_jit(labels, depths, intrs, robot2cams, min_friends,
                          min_dist, nb_neighbors, voxel_size, cap: int):
    """Batched per-view surface extraction as ONE compiled graph.

    labels (V, H, W) int, depths (V, H, W) mm, intrs (V, 4), robot2cams
    (V, 4, 4) -> ((V, cap, 3) robot-frame points, (V, cap) validity). The
    full H*W lattice is backprojected under its mask (no host nonzero), the
    exact voxel downsample runs on the lattice, and because the downsample
    emits its K voxel means as the valid prefix, a static slice to `cap`
    keeps every voxel whenever K <= cap; the O(N^2) outlier stages then run
    on the cap-sized cloud. vmapped over the view axis, so sharding the
    inputs over a mesh 'data' axis runs views on separate chips — the
    multi-chip reconstruction mode (SURVEY §2.13: view-axis parallelism of
    the offline pipeline; each view's chain is independent until ICP).
    """

    def one(label, depth, intr, r2c):
        h, w = label.shape
        rr = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
        cc = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
        z = depth.reshape(-1).astype(jnp.float32)
        valid = (label.reshape(-1) != 0) & (z > 0)
        cam = proj.pixels_to_points(rr, cc, z, intr)
        robot = cam @ r2c[:3, :3].T + r2c[:3, 3]
        pts, v = pc.voxel_downsample(robot, valid, voxel_size)
        k = jnp.sum(v.astype(jnp.int32))  # true voxel count, pre-slice
        pts, v = pts[:cap], v[:cap]
        v = _clean_chain(pts, v, min_friends, min_dist, nb_neighbors)
        return jnp.where(v[:, None], pts, 0.0), v, k

    return jax.vmap(one)(labels, depths, intrs, robot2cams)


def get_surfaces_batched(labels: Sequence[np.ndarray],
                         depths: Sequence[np.ndarray], intrs, robot2cams,
                         min_friends: int, min_dist: float, nb_neighbors: int,
                         voxel_size: float, mesh=None,
                         cap: int = 4096) -> List[np.ndarray]:
    """All views' surfaces in one device call, optionally sharded over a
    `jax.sharding.Mesh` 'data' axis (one or more views per chip). Returns a
    compacted (K_i, 3) robot-frame cloud per view, matching per-view
    `get_surface` output up to float association order."""
    v = len(labels)
    if v == 0:
        return []
    lab = np.stack([np.asarray(x) for x in labels]).astype(np.int32)
    dep = np.stack([np.asarray(x, np.float32) for x in depths])
    ivec = []
    for intr in (intrs if isinstance(intrs, (list, tuple)) else [intrs] * v):
        ivec.append(intr.as_array() if hasattr(intr, "as_array")
                    else np.asarray([intr["fx"], intr["fy"], intr["ppx"],
                                     intr["ppy"]], np.float32))
    ivec = np.stack(ivec).astype(np.float32)
    r2c = np.stack([np.asarray(t, np.float32) for t in robot2cams])

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        nd = mesh.shape["data"]
        pad = (-v) % nd
        if pad:  # padded views: empty masks -> no valid output points
            lab = np.concatenate([lab, np.zeros((pad,) + lab.shape[1:],
                                                lab.dtype)])
            dep = np.concatenate([dep, np.zeros((pad,) + dep.shape[1:],
                                                dep.dtype)])
            ivec = np.concatenate([ivec, np.ones((pad, 4), np.float32)])
            r2c = np.concatenate(
                [r2c, np.broadcast_to(np.eye(4, dtype=np.float32),
                                      (pad, 4, 4))])
        shard = NamedSharding(mesh, P("data"))
        lab, dep, ivec, r2c = (jax.device_put(x, shard)
                               for x in (lab, dep, ivec, r2c))
    pts, val, ks = _surfaces_batched_jit(
        jnp.asarray(lab), jnp.asarray(dep), jnp.asarray(ivec),
        jnp.asarray(r2c), min_friends=int(min_friends),
        min_dist=jnp.float32(min_dist), nb_neighbors=int(nb_neighbors),
        voxel_size=jnp.float32(voxel_size), cap=cap)
    pts = np.asarray(pts)
    val = np.asarray(val)
    ks = np.asarray(ks)
    out = []
    for i in range(v):
        if ks[i] > cap:
            # the static slice would drop a CONTIGUOUS high-voxel-id region
            # (the downsample orders by voxel id) — recompute this view
            # exactly on the per-view path instead of truncating silently
            out.append(get_surface(np.asarray(labels[i]),
                                   np.asarray(depths[i]),
                                   {"fx": ivec[i][0], "fy": ivec[i][1],
                                    "ppx": ivec[i][2], "ppy": ivec[i][3]},
                                   r2c[i], min_friends, min_dist,
                                   nb_neighbors, voxel_size))
        else:
            out.append(pc.compact(pts[i], val[i]))
    return out


def _icp_merge(target_np: np.ndarray, source_np: np.ndarray,
               voxel_size: float, threshold: float,
               icp_point2point: bool = True,
               icp_point2plane: bool = False,
               global_regression: bool = False) -> np.ndarray:
    """icp_regression + merge (downsampled clouds, reference semantics:
    registration runs on the voxel-downsampled clouds and the merged cloud is
    built from them)."""
    size = max(len(target_np), len(source_np))
    t, tv = pc.pad_bucket(target_np, min_size=max(1024, size))
    s, sv = pc.pad_bucket(source_np, min_size=max(1024, size))
    tgt, tvalid, src, svalid, tf = icp_ops.icp_regression(
        jnp.asarray(t), jnp.asarray(tv), jnp.asarray(s), jnp.asarray(sv),
        voxel_size=voxel_size, threshold=threshold,
        icp_point2point=icp_point2point, icp_point2plane=icp_point2plane,
        global_regression=global_regression)
    tf = np.asarray(tf)
    src_np = pc.compact(src, svalid)
    tgt_np = pc.compact(tgt, tvalid)
    moved = src_np @ tf[:3, :3].T + tf[:3, 3]
    merged = np.concatenate([moved, tgt_np])
    mp, mv = pc.pad_bucket(merged)
    mp, mv = pc.voxel_downsample(jnp.asarray(mp), jnp.asarray(mv), voxel_size)
    return pc.compact(mp, mv)


def align_point_clouds(clouds: List[np.ndarray], min_friends: int,
                       min_dist: float, nb_neighbors: int,
                       voxel_size: float = 5.0,
                       threshold: float = 50.0) -> np.ndarray:
    """Cross-run alignment (open3d_utils.py:125-168): y-offset nudge, p2p ICP,
    merge, voxel downsample, radius + statistical outlier removal."""
    target = clouds[0]
    for source in clouds[1:]:
        diff = source.mean(axis=0) - target.mean(axis=0)
        if diff[1] > -30:
            source = source + np.asarray([0.0, -30.0 - diff[1], 0.0])
        target = _icp_merge(target, source, voxel_size, threshold)
        tp, tv = pc.pad_bucket(target)
        tp = jnp.asarray(tp)
        tv = jnp.asarray(tv)
        tv = _clean_chain(tp, tv, min_friends, min_dist, nb_neighbors)
        target = pc.compact(tp, tv)
    return target


def get_surface_positions(root: str, object_name: str, run: str,
                          min_friends: int, min_dist: float,
                          nb_neighbors: int, mode: str = "gen",
                          voxel_size: float = 5.0, mesh=None) -> np.ndarray:
    """Per-sample (surface centroid, camera position) pairs in the robot
    frame — the triangulation inputs of open3d_utils.py:332-382. Combine with
    ops/pointcloud.triangulate_position to localize an object from views.
    With `mesh`, all views run as one batched graph sharded over 'data'."""
    label_root = os.path.join(io.label_dir(root), object_name, run)
    data_root = os.path.join(io.data_dir(root), object_name, run)

    def read_view(fn):
        stem = fn[: -len(f".{mode}.label.png")]
        meta = io.read_sample_meta(os.path.join(data_root,
                                                stem + ".meta.json"))
        return (io.read_label(os.path.join(label_root, fn)),
                io.read_depth(os.path.join(
                    data_root, stem + ".depth.png")).astype(np.float64),
                meta["intr"], io.robot2cam_from_meta(meta))

    fns = [fn for fn in sorted(os.listdir(label_root))
           if fn.endswith(f".{mode}.label.png")]
    if mesh is not None:
        views = [read_view(fn) for fn in fns]
        surfaces = get_surfaces_batched(
            [v[0] for v in views], [v[1] for v in views],
            [v[2] for v in views], [v[3] for v in views],
            min_friends, min_dist, nb_neighbors, voxel_size, mesh=mesh)
        r2cs = [v[3] for v in views]
    else:  # streaming: one view in memory at a time
        surfaces, r2cs = [], []
        for fn in fns:
            label, depth, intr, r2c = read_view(fn)
            surfaces.append(get_surface(label, depth, intr, r2c, min_friends,
                                        min_dist, nb_neighbors, voxel_size))
            r2cs.append(r2c)
    positions = [[s.mean(axis=0), rc[:3, 3]]
                 for s, rc in zip(surfaces, r2cs) if len(s)]
    return np.asarray(positions)


def load_point_cloud(object_name: str, save_dir: str, root: str,
                     reference_point=np.zeros(3), mode: str = "gen",
                     n_viewpoints: int = 10, min_friends: int = 10,
                     voxel_size: float = 5.0, voxel_size_out: float = 10.0,
                     threshold: float = 50.0, min_dist: float = 10.0,
                     nb_neighbors: int = 5, global_regression: bool = False,
                     icp_point2point: bool = True,
                     icp_point2plane: bool = True,
                     progress=None, mesh=None) -> np.ndarray:
    """Reconstruct one object from its labeled runs; writes all artifacts.
    Returns the final centered cloud (mm). With `mesh` (a jax.sharding.Mesh
    with a 'data' axis), each run's per-view surface extraction — the
    device-heavy half of the pipeline — runs as ONE batched graph with views
    sharded across chips; the sequential ICP merge then consumes the
    precomputed surfaces."""
    label_root = os.path.join(io.label_dir(root), object_name)
    runs = [d for d in sorted(os.listdir(label_root)) if d != "extra"]
    if not runs:
        raise ValueError("no labels obtained yet")
    data_path = os.path.join(io.data_dir(root), object_name)
    pcd_path = os.path.join(save_dir, object_name)
    os.makedirs(pcd_path, exist_ok=True)

    run_clouds: List[np.ndarray] = []
    for run in runs:
        labels = [f for f in os.listdir(os.path.join(label_root, run))
                  if f.endswith(f".{mode}.label.png")]
        n = len(labels)
        take = min(n_viewpoints, n)
        idx_selection = get_view_distribution(data_path, run, n, take)

        def read_view(idx):
            meta = io.read_sample_meta(
                os.path.join(data_path, run, f"{idx:06d}.meta.json"))
            label = io.read_label(os.path.join(
                label_root, run, f"{idx:06d}.{mode}.label.png"))
            depth = io.read_depth(os.path.join(
                data_path, run, f"{idx:06d}.depth.png")).astype(np.float64)
            return (label, depth, meta["intr"],
                    io.robot2cam_from_meta(meta),
                    np.asarray(meta["object_pose"])[:3, :3])

        rotation = np.eye(3)
        if mesh is not None:  # view-sharded: all surfaces in one device call
            views = [read_view(idx) for idx in idx_selection]
            if views:
                rotation = views[-1][4]
            surfaces = get_surfaces_batched(
                [v[0] for v in views], [v[1] for v in views],
                [v[2] for v in views], [v[3] for v in views],
                min_friends, min_dist, nb_neighbors, voxel_size, mesh=mesh)
        else:
            surfaces = None

        merged: Optional[np.ndarray] = None
        for view_i, idx in enumerate(idx_selection):
            if surfaces is not None:
                source = surfaces[view_i]
            else:  # streaming path: one view in memory at a time
                label, depth, intr, r2c, rotation = read_view(idx)
                source = get_surface(label, depth, intr, r2c, min_friends,
                                     min_dist, nb_neighbors, voxel_size)
            if len(source) == 0:
                continue
            if merged is None:
                merged = source
            else:
                merged = _icp_merge(merged, source, voxel_size, threshold,
                                    icp_point2point, icp_point2plane,
                                    global_regression)
            if progress is not None:
                progress(run, int(idx), len(merged))

        if merged is None:
            continue
        # rotate the run cloud by its object_pose rotation about its center
        # (Open3D rotate(center=True), create_pointcloud.py:320)
        center = merged.mean(axis=0)
        merged = (merged - center) @ rotation.T + center
        io.write_ply(os.path.join(pcd_path, f"{run}.ply"), merged)
        io.write_pcd(os.path.join(pcd_path, f"{run}.pcd"), merged)
        run_clouds.append(merged)

    cloud = align_point_clouds(run_clouds, min_friends, min_dist,
                               nb_neighbors, voxel_size, threshold)
    io.write_ply(os.path.join(pcd_path, f"{object_name}_out.ply"), cloud)
    io.write_pcd(os.path.join(pcd_path, f"{object_name}_out.pcd"), cloud)

    # centered cloud at voxel_size_out
    cp, cv = pc.pad_bucket(cloud)
    center = np.asarray(pc.aabb_center(jnp.asarray(cp), jnp.asarray(cv)))
    dp, dv = pc.voxel_downsample(jnp.asarray(cp), jnp.asarray(cv),
                                 voxel_size_out)
    down = pc.compact(dp, dv) - center
    io.write_ply(os.path.join(pcd_path, f"{object_name}.ply"), down)
    io.write_pcd(os.path.join(pcd_path, f"{object_name}.pcd"), down)

    # .xyz: voxel-size search until < 1000 points (create_pointcloud.py:365-376)
    big = cloud - center
    vs = voxel_size
    out = big
    while len(out) >= 1000:
        vs += 0.1
        out = _np_voxel_centroids(big, vs)
    io.write_xyz(os.path.join(pcd_path, f"{object_name}.xyz"), out)
    return down
