"""On-disk dataset contract (SURVEY.md L0) — readers/writers.

The reference's real inter-layer interface is its filesystem layout; we preserve
it byte-compatibly so datasets recorded by either implementation interoperate:

  data_generation/data/<obj>/<run>/{NNNNNN.color.png, NNNNNN.depth.png, NNNNNN.meta.json}
  label_generator/data/<obj>/<run>/{NNNNNN.<mode>.label.png, NNNNNN.meta.json}
  label_generator/data_sets/{segmentation|pose_estimation}/<ds>/
      {classes.txt, train_data_list.txt, test_data_list.txt, extra_train_data_list.txt}
  pc_reconstruction/data/<obj>/{<run>.ply/.pcd, <obj>.ply, <obj>_out.ply, <obj>.xyz}

Schemas: acquisition meta written at /root/reference/data_generation/getData.py:177-221
(keys: joints, pose, object_pose, robot2endEff_tf, intr{...}, depth_scale, symmetric,
hand_eye_calibration, view_point_id); pose-label meta written at
/root/reference/label_generator/create_labels.py:422-426 (keys: position, rotation,
cls_name, cam2robot, robot2object). All host-side numpy — no JAX here.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np
from PIL import Image


# ---------------------------------------------------------------------------
# Camera intrinsics
# ---------------------------------------------------------------------------

@dataclass
class Intrinsics:
    """Pinhole intrinsics as stored in the acquisition meta.json `intr` dict."""

    width: int = 640
    height: int = 480
    ppx: float = 320.0
    ppy: float = 240.0
    fx: float = 600.0
    fy: float = 600.0
    coeffs: List[float] = field(default_factory=lambda: [0.0] * 5)

    @classmethod
    def from_dict(cls, d: Dict) -> "Intrinsics":
        return cls(
            width=int(d["width"]),
            height=int(d["height"]),
            ppx=float(d["ppx"]),
            ppy=float(d["ppy"]),
            fx=float(d["fx"]),
            fy=float(d["fy"]),
            coeffs=list(d.get("coeffs", [0.0] * 5)),
        )

    def to_dict(self) -> Dict:
        return {
            "width": self.width,
            "height": self.height,
            "ppx": self.ppx,
            "ppy": self.ppy,
            "fx": self.fx,
            "fy": self.fy,
            "coeffs": self.coeffs,
        }

    def as_array(self) -> np.ndarray:
        """(fx, fy, ppx, ppy) vector for jitted projection ops."""
        return np.asarray([self.fx, self.fy, self.ppx, self.ppy], dtype=np.float32)


# ---------------------------------------------------------------------------
# JSON metadata
# ---------------------------------------------------------------------------

def read_json(path: str) -> Dict:
    with open(path) as f:
        return json.load(f)


def write_json(path: str, data: Dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(data, f)


def read_sample_meta(path: str) -> Dict:
    """Acquisition meta.json. Returns the raw dict with `intr` parsed and the
    4x4 transforms reshaped (`robot2endEff_tf`, `hand_eye_calibration`,
    `object_pose`), all in mm as written by acquisition."""
    meta = read_json(path)
    out = dict(meta)
    out["intr"] = Intrinsics.from_dict(meta["intr"])
    for key in ("robot2endEff_tf", "hand_eye_calibration", "object_pose"):
        if key in meta and meta[key] is not None:
            out[key] = np.asarray(meta[key], dtype=np.float64).reshape(4, 4)
    return out


def write_sample_meta(path: str, meta: Dict) -> None:
    out = dict(meta)
    if isinstance(out.get("intr"), Intrinsics):
        out["intr"] = out["intr"].to_dict()
    for key in ("robot2endEff_tf", "hand_eye_calibration", "object_pose"):
        if key in out and isinstance(out[key], np.ndarray):
            out[key] = [float(v) for v in out[key].flatten()]
    write_json(path, out)


def read_pose_label_meta(path: str) -> Dict:
    """Pose-label meta.json: position (3, mm), rotation (3x3), cls_name,
    cam2robot (4x4, mm), robot2object (4x4, mm)."""
    meta = read_json(path)
    out = dict(meta)
    out["position"] = np.asarray(meta["position"], dtype=np.float64).reshape(3)
    out["rotation"] = np.asarray(meta["rotation"], dtype=np.float64).reshape(3, 3)
    out["cam2robot"] = np.asarray(meta["cam2robot"], dtype=np.float64).reshape(4, 4)
    out["robot2object"] = np.asarray(meta["robot2object"], dtype=np.float64).reshape(4, 4)
    return out


def write_pose_label_meta(path: str, position, rotation, cls_name: str,
                          cam2robot, robot2object) -> None:
    write_json(
        path,
        {
            "position": [float(v) for v in np.asarray(position).flatten()],
            "rotation": [float(v) for v in np.asarray(rotation).flatten()],
            "cls_name": cls_name,
            "cam2robot": [float(v) for v in np.asarray(cam2robot).flatten()],
            "robot2object": [float(v) for v in np.asarray(robot2object).flatten()],
        },
    )


# ---------------------------------------------------------------------------
# Images
# ---------------------------------------------------------------------------

def read_color(path: str) -> np.ndarray:
    """RGB uint8 (H, W, 3)."""
    return np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)


def read_depth(path: str) -> np.ndarray:
    """Depth uint16 (H, W) in camera units (mm at depth_scale*1000)."""
    return np.asarray(Image.open(path), dtype=np.uint16)


def read_label(path: str) -> np.ndarray:
    """Label uint8 (H, W): binary masks use 255, multi-class use class ids."""
    return np.asarray(Image.open(path), dtype=np.uint8)


def write_png(path: str, array: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(array).save(path)


# ---------------------------------------------------------------------------
# Class lists & data lists
# ---------------------------------------------------------------------------

def read_lines(path: str) -> List[str]:
    """Newline-terminated list files (classes.txt, *_data_list.txt). The
    reference reads with `readline()[:-1]` until empty; equivalent to
    stripping trailing newlines and stopping at the first blank line."""
    out: List[str] = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                break
            out.append(line)
    return out


def write_lines(path: str, lines: List[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for line in lines:
            f.write(line + "\n")


# ---------------------------------------------------------------------------
# Point clouds (.xyz / .ply / .pcd-ascii)
# ---------------------------------------------------------------------------

def read_xyz(path: str) -> np.ndarray:
    """Reference `.xyz` format: one numpy-array repr per line, e.g. `[x y z]`
    (written at /root/reference/pc_reconstruction/create_pointcloud.py:374-376).
    Parses robustly (bracket strip + whitespace split)."""
    points = []
    with open(path) as f:
        for line in f:
            line = line.strip().strip("[]")
            if not line:
                continue
            vals = [float(v) for v in line.split()]
            if len(vals) >= 3:
                points.append(vals[:3])
    return np.asarray(points, dtype=np.float64)


def write_xyz(path: str, points: np.ndarray) -> None:
    """Writes the same `[x y z]` numpy-repr lines the reference emits."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for p in np.asarray(points):
            f.write("%s\n" % p)


def read_ply(path: str) -> np.ndarray:
    """Minimal ascii/binary-LE PLY reader returning the vertex xyz array."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        n_vertex = int(next(l.split()[-1] for l in header if l.startswith("element vertex")))
        props = [l.split() for l in header if l.startswith("property")]
        # property offsets/types for the vertex element only (assume single element)
        dtypes = {"float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
                  "uchar": "u1", "uint8": "u1", "int": "i4", "int32": "i4"}
        names = [p[2] for p in props]
        types = [dtypes[p[1]] for p in props]
        if fmt == "ascii":
            data = np.loadtxt(f, max_rows=n_vertex, dtype=np.float64)
            data = data.reshape(n_vertex, -1)
            idx = [names.index(c) for c in ("x", "y", "z")]
            return data[:, idx]
        endian = "<" if "little" in fmt else ">"
        rec = np.dtype([(n, endian + t) for n, t in zip(names, types)])
        data = np.frombuffer(f.read(rec.itemsize * n_vertex), dtype=rec)
        return np.stack([data["x"], data["y"], data["z"]], axis=1).astype(np.float64)


def write_ply(path: str, points: np.ndarray) -> None:
    """ASCII PLY writer (xyz only) — interoperable with Open3D readers."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    points = np.asarray(points, dtype=np.float64)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write("element vertex %d\n" % len(points))
        f.write("property double x\nproperty double y\nproperty double z\n")
        f.write("end_header\n")
        for p in points:
            f.write("%.10g %.10g %.10g\n" % (p[0], p[1], p[2]))


def write_pcd(path: str, points: np.ndarray) -> None:
    """ASCII PCD writer (xyz only)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    points = np.asarray(points, dtype=np.float64)
    n = len(points)
    with open(path, "w") as f:
        f.write("# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n")
        f.write("FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n")
        f.write("WIDTH %d\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS %d\nDATA ascii\n" % (n, n))
        for p in points:
            f.write("%.10g %.10g %.10g\n" % (p[0], p[1], p[2]))


def read_pcd(path: str) -> np.ndarray:
    """Minimal ascii PCD reader (xyz)."""
    with open(path) as f:
        n = 0
        for line in f:
            s = line.strip()
            if s.startswith("POINTS"):
                n = int(s.split()[-1])
            if s.startswith("DATA"):
                if "ascii" not in s:
                    raise ValueError("only ascii PCD supported")
                break
        data = np.loadtxt(f, max_rows=n, dtype=np.float64)
    return data.reshape(n, -1)[:, :3]


# ---------------------------------------------------------------------------
# Repo layout helpers
# ---------------------------------------------------------------------------

def data_dir(root: str) -> str:
    return os.path.join(root, "data_generation", "data")


def label_dir(root: str) -> str:
    return os.path.join(root, "label_generator", "data")


def dataset_dir(root: str, kind: str, name: str) -> str:
    """kind in {segmentation, pose_estimation}."""
    return os.path.join(root, "label_generator", "data_sets", kind, name)


def pc_dir(root: str) -> str:
    return os.path.join(root, "pc_reconstruction", "data")


def list_objects(root: str) -> List[str]:
    d = data_dir(root)
    if not os.path.isdir(d):
        return []
    return sorted(o for o in os.listdir(d) if os.path.isdir(os.path.join(d, o)))


def list_runs(root: str, obj: str) -> List[str]:
    d = os.path.join(data_dir(root), obj)
    if not os.path.isdir(d):
        return []
    return sorted(r for r in os.listdir(d) if os.path.isdir(os.path.join(d, r)))


def list_sample_ids(run_dir: str) -> List[str]:
    """Sample stems (e.g. '000012') present in an acquisition run directory."""
    ids = set()
    for fn in os.listdir(run_dir):
        if fn.endswith(".color.png"):
            ids.add(fn[: -len(".color.png")])
    return sorted(ids)


def robot2cam_from_meta(meta: Dict) -> np.ndarray:
    """robot->camera 4x4 (mm): robot2endEff @ handEye, as used throughout
    (/root/reference/pc_reconstruction/open3d_utils.py:361-363)."""
    return np.asarray(meta["robot2endEff_tf"]) @ np.asarray(meta["hand_eye_calibration"])
