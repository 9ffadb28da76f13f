"""Synthetic RGB-D dataset generator — the hermetic test fixture.

The reference has no test fixtures at all (SURVEY.md §4); every flow needs a
real robot + camera. This module ray-traces an exact tabletop scene (plane +
spheres) from a ring of camera viewpoints and writes the complete on-disk
dataset contract (SURVEY.md L0): acquisition runs with color/depth/meta,
ground-truth labels, pose-label metas, dataset lists, and model .xyz clouds.
Everything downstream (datasets, label generation, reconstruction, training,
eval) can run against it with known ground truth.

Geometry conventions match acquisition: robot frame in mm, the table is the
robot z=0 plane, `robot2endEff_tf` placed so robot2cam = robot2endEff @ handEye
with handEye = identity; depth PNGs are uint16 mm (depth_scale 0.001).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

from . import io


@dataclass
class SphereObject:
    """A sphere, optionally with extra sphere 'parts' (offset, radius) glued
    on — compound shapes break the rotational symmetry so ICP-based
    reconstruction is well-posed (a perfect sphere is degenerate for ICP)."""

    name: str
    center: np.ndarray          # robot frame, mm
    radius: float               # mm
    color: Tuple[int, int, int]
    symmetric: int = 1
    # extra spheres glued on: (offset_xyz, radius) or
    # (offset_xyz, radius, color). A part color makes the orientation
    # observable in RGB — the flat-shaded renderer otherwise hides rotation
    # from the color branch entirely (the round-3 demo's ADD plateau was
    # exactly this, not fixture resolution)
    parts: Tuple = ()


def object_spheres(obj: "SphereObject"):
    """(center, radius, color) list for the object's main sphere + parts."""
    out = [(np.asarray(obj.center, float), obj.radius, obj.color)]
    for part in obj.parts:
        off, rad = part[0], part[1]
        col = part[2] if len(part) > 2 else obj.color
        out.append((np.asarray(obj.center, float) + np.asarray(off, float),
                    rad, col))
    return out


@dataclass
class SynthConfig:
    img_h: int = 128
    img_w: int = 160
    fx: float = 140.0
    fy: float = 140.0
    n_viewpoints: int = 12
    ring_radius: float = 420.0  # mm
    ring_height: float = 380.0  # mm
    depth_scale: float = 0.001
    table_color: Tuple[int, int, int] = (110, 110, 115)
    noise: float = 0.0          # depth noise (mm)
    seed: int = 0


def look_at(cam_pos: np.ndarray, target: np.ndarray) -> np.ndarray:
    """robot->camera 4x4 (mm): camera z-axis points at target."""
    z = target - cam_pos
    z = z / np.linalg.norm(z)
    up = np.asarray([0.0, 0.0, -1.0])
    if abs(np.dot(up, z)) > 0.98:
        up = np.asarray([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    tf = np.eye(4)
    tf[:3, 0], tf[:3, 1], tf[:3, 2] = x, y, z
    tf[:3, 3] = cam_pos
    return tf


def ring_cameras(cfg: SynthConfig, target: np.ndarray) -> List[np.ndarray]:
    cams = []
    for i in range(cfg.n_viewpoints):
        a = 2 * np.pi * i / cfg.n_viewpoints
        pos = np.asarray([cfg.ring_radius * np.cos(a),
                          cfg.ring_radius * np.sin(a),
                          cfg.ring_height])
        cams.append(look_at(pos, target))
    return cams


def render(cfg: SynthConfig, robot2cam: np.ndarray,
           spheres: Sequence[SphereObject]):
    """Exact ray-traced depth (mm), color, and per-sphere masks."""
    h, w = cfg.img_h, cfg.img_w
    ppx, ppy = w / 2.0, h / 2.0
    cols, rows = np.meshgrid(np.arange(w), np.arange(h))
    d = np.stack([(cols - ppx) / cfg.fx, (rows - ppy) / cfg.fy,
                  np.ones_like(cols, dtype=np.float64)], axis=-1)

    # table: robot-frame plane z=0 -> camera frame n.(t*d - p0) = 0
    rot_rc = robot2cam[:3, :3].T  # R(cam <- robot)
    n = rot_rc @ np.asarray([0.0, 0.0, 1.0])
    # point on plane (robot origin) in camera frame
    p0 = rot_rc @ (np.zeros(3) - robot2cam[:3, 3])
    denom = d @ n
    t_plane = np.where(np.abs(denom) > 1e-9, (p0 @ n) / denom, np.inf)
    t_plane = np.where(t_plane > 0, t_plane, np.inf)

    depth_t = t_plane
    color = np.empty((h, w, 3), np.float64)
    color[:] = cfg.table_color
    owner = np.full((h, w), -1, np.int32)

    sphere_list = []
    for si, sp in enumerate(spheres):
        for c, r, col in object_spheres(sp):
            sphere_list.append((si, c, r, col))
    for si, c_robot, radius, col in sphere_list:
        c_cam = rot_rc @ (c_robot - robot2cam[:3, 3])
        b = d @ c_cam
        cc = c_cam @ c_cam - radius ** 2
        disc = b * b - (d * d).sum(-1) * cc
        t_sp = np.where(disc >= 0,
                        (b - np.sqrt(np.maximum(disc, 0.0))) / (d * d).sum(-1),
                        np.inf)
        t_sp = np.where(t_sp > 0, t_sp, np.inf)
        hit = t_sp < depth_t
        depth_t = np.where(hit, t_sp, depth_t)
        owner = np.where(hit, si, owner)
        color[hit] = col

    zdepth = depth_t * d[..., 2]  # z-depth == t since d_z == 1
    zdepth = np.where(np.isfinite(zdepth), zdepth, 0.0)
    if cfg.noise > 0:
        rng = np.random.default_rng(cfg.seed)
        zdepth = np.where(zdepth > 0,
                          zdepth + rng.normal(0, cfg.noise, zdepth.shape), 0.0)
    return (color.astype(np.uint8), zdepth, owner)


def headline_scene(num_classes: int = 5, img_hw: Tuple[int, int] = (480, 640),
                   model_pts: int = 1000):
    """The headline benchmark's exact 5-object tabletop scene.

    Single source of truth shared by bench.py, scripts/train_bench_seg.py and
    scripts/bench_extra.py — the RNG draw ORDER (model points first, then
    sphere colors) is part of the contract: it reproduces the identical frame
    the headline has always measured. Returns (cfg, spheres, model_points).
    """
    rng = np.random.default_rng(0)
    model_points = rng.normal(
        size=(num_classes, model_pts, 3)).astype(np.float32) * 0.05
    cfg = SynthConfig(img_h=img_hw[0], img_w=img_hw[1], fx=600.0, fy=600.0,
                      ring_radius=500.0, ring_height=450.0)
    spheres = [
        SphereObject(f"obj{i}",
                     np.asarray([120.0 * np.cos(a), 120.0 * np.sin(a), 40.0]),
                     45.0,
                     tuple(int(v) for v in rng.integers(60, 255, 3)))
        for i, a in enumerate(np.linspace(0, 2 * np.pi, num_classes,
                                          endpoint=False))
    ]
    return cfg, spheres, model_points


def sphere_model_points(radius: float, n: int = 500, seed: int = 0) -> np.ndarray:
    """Fibonacci-sphere surface samples (mm, centered)."""
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5 ** 0.5) * i
    return np.stack([radius * np.sin(phi) * np.cos(theta),
                     radius * np.sin(phi) * np.sin(theta),
                     radius * np.cos(phi)], axis=1)


def make_dataset(root: str, objects: Sequence[SphereObject] = None,
                 cfg: SynthConfig = None, dataset_name: str = "synth",
                 p_test: float = 0.2) -> Dict:
    """Write the full L0 contract. Returns a manifest dict."""
    cfg = cfg or SynthConfig()
    if objects is None:
        objects = [
            SphereObject("red_ball", np.asarray([40.0, 0.0, 35.0]), 35.0,
                         (200, 40, 40)),
            SphereObject("blue_ball", np.asarray([-50.0, 30.0, 28.0]), 28.0,
                         (40, 60, 200)),
        ]
    intr = io.Intrinsics(width=cfg.img_w, height=cfg.img_h,
                         ppx=cfg.img_w / 2.0, ppy=cfg.img_h / 2.0,
                         fx=cfg.fx, fy=cfg.fy)
    hand_eye = np.eye(4)
    target = np.asarray([0.0, 0.0, 0.0])
    cams = ring_cameras(cfg, target)

    manifest = {"objects": [], "cams": cams, "intr": intr, "cfg": cfg}

    for obj in objects:
        # per-object scene: this object alone on the table (matches the
        # reference's one-object-per-scan acquisition)
        for run, spheres in (("background", []), ("foreground", [obj])):
            run_dir = os.path.join(io.data_dir(root), obj.name, run)
            label_run_dir = os.path.join(io.label_dir(root), obj.name, run)
            os.makedirs(run_dir, exist_ok=True)
            for vp, robot2cam in enumerate(cams):
                color, depth, owner = render(cfg, robot2cam, spheres)
                robot2end = robot2cam @ np.linalg.inv(hand_eye)
                meta = {
                    "joints": [0.0] * 6,
                    "pose": {"x": float(robot2end[0, 3]),
                             "y": float(robot2end[1, 3]),
                             "z": float(robot2end[2, 3]),
                             "a": 0.0, "b": 0.0, "c": 0.0},
                    "object_pose": np.eye(4),
                    "robot2endEff_tf": robot2end,
                    "intr": intr,
                    "depth_scale": cfg.depth_scale,
                    "symmetric": obj.symmetric,
                    "hand_eye_calibration": hand_eye,
                    "view_point_id": vp,
                }
                stem = f"{vp:06d}"
                io.write_png(os.path.join(run_dir, stem + ".color.png"), color)
                io.write_png(os.path.join(run_dir, stem + ".depth.png"),
                             np.round(depth).astype(np.uint16))
                io.write_sample_meta(os.path.join(run_dir, stem + ".meta.json"),
                                     meta)
                if run == "foreground":
                    mask = ((owner == 0).astype(np.uint8)) * 255
                    for mode in ("gen", "pred", "new_pred"):
                        io.write_png(os.path.join(
                            label_run_dir, f"{stem}.{mode}.label.png"), mask)
                    cam2robot = np.linalg.inv(robot2cam)
                    robot2object = np.eye(4)
                    robot2object[:3, 3] = obj.center
                    # position/rotation are the CAMERA-frame object pose —
                    # the same cam2robot @ robot2object composition the real
                    # labeling pipeline writes (labeling/pose_labels.py;
                    # reference label_generator/create_labels.py:422-426)
                    cam2object = cam2robot @ robot2object
                    io.write_pose_label_meta(
                        os.path.join(label_run_dir, stem + ".meta.json"),
                        position=cam2object[:3, 3],
                        rotation=cam2object[:3, :3],
                        cls_name=obj.name, cam2robot=cam2robot,
                        robot2object=robot2object)

        # model cloud (.xyz, mm, centered) + .ply in robot frame
        model_parts = []
        for c, r, _col in object_spheres(obj):
            model_parts.append(sphere_model_points(r, 500) + (c - obj.center))
        model = np.concatenate(model_parts)[:1000]
        io.write_xyz(os.path.join(io.pc_dir(root), obj.name,
                                  obj.name + ".xyz"), model)
        io.write_ply(os.path.join(io.pc_dir(root), obj.name,
                                  obj.name + "_out.ply"), model + obj.center)
        io.write_ply(os.path.join(io.pc_dir(root), obj.name,
                                  obj.name + ".ply"), model)
        manifest["objects"].append(obj)

    # dataset lists (segmentation + pose_estimation), every-Nth test split
    names = [o.name for o in objects]
    for kind in ("segmentation", "pose_estimation"):
        ds = io.dataset_dir(root, kind, dataset_name)
        train, test = [], []
        for obj in objects:
            stems = [f"{obj.name}/foreground/{vp:06d}"
                     for vp in range(cfg.n_viewpoints)]
            n_test = max(int(len(stems) * p_test), 1)
            step = max(len(stems) // n_test, 1)
            for i, s in enumerate(stems):
                (test if i % step == 0 and len(
                    [t for t in test if t.startswith(obj.name)]) < n_test
                 else train).append(s)
        io.write_lines(os.path.join(ds, "classes.txt"), names)
        io.write_lines(os.path.join(ds, "train_data_list.txt"), train)
        io.write_lines(os.path.join(ds, "test_data_list.txt"), test)
        io.write_lines(os.path.join(ds, "extra_train_data_list.txt"), [])
    manifest["dataset_name"] = dataset_name
    return manifest
