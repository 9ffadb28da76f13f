"""Legacy benchmark dataset loaders: YCB-Video and LineMOD.

Inventory parity with the upstream dataset variants the reference vendors
(/root/reference/DenseFusion/datasets/ycb/dataset.py and datasets/linemod/
dataset.py): loaders over the public benchmark layouts producing the same
sample contract as our PoseDataset (img crop, cloud, choose, target,
model_points, obj_idx, is_sym) so the DenseFusion trainer/eval run on them
unchanged.

Layouts:
  YCB-Video: <root>/data/NNNN/NNNNNN-{color.png,depth.png,label.png,meta.mat}
             with meta.mat keys cls_indexes, poses, factor_depth;
             models/<cls>/points.xyz.
  LineMOD:   <root>/data/NN/{rgb,depth,mask}/NNNN.png + gt.yml (per-frame
             cam_R_m2c, cam_t_m2c) + models/obj_NN.ply; depth factor 1000.

These read real benchmark trees; the tests exercise them on miniature
synthetic trees in the same layout.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from ..models.common import IMAGENET_MEAN, IMAGENET_STD
from ..utils import io

YCB_SYM_IDS = (12, 15, 18, 19, 20)  # upstream symmetric object indices
LINEMOD_SYM_IDS = (7, 8)            # eggbox, glue (upstream list)


def _choose_and_backproject(depth, mask, intr_vec, cam_scale, num_pt, crop,
                            rng):
    """Shared crop->choose->backproject (same math as data/pose_dataset.py)."""
    fx, fy, ppx, ppy = intr_vec
    valid = mask & (depth > 0)
    if not valid.any():
        return None
    rows = np.any(mask, axis=1)
    cols = np.any(mask, axis=0)
    rc = (np.where(rows)[0][[0, -1]].sum() + 1) // 2
    cc = (np.where(cols)[0][[0, -1]].sum() + 1) // 2
    h, w = mask.shape
    crop = min(crop, h, w)
    crop -= crop % 8
    r0 = int(np.clip(rc - crop // 2, 0, max(h - crop, 0)))
    c0 = int(np.clip(cc - crop // 2, 0, max(w - crop, 0)))
    win = valid[r0:r0 + crop, c0:c0 + crop]
    choose = win.flatten().nonzero()[0]
    if len(choose) == 0:
        return None
    if len(choose) > num_pt:
        sel = np.zeros(len(choose), dtype=int)
        sel[:num_pt] = 1
        rng.shuffle(sel)
        choose = choose[sel.nonzero()]
    else:
        choose = np.pad(choose, (0, num_pt - len(choose)), "wrap")
    drow = r0 + choose // crop
    dcol = c0 + choose % crop
    z = depth[drow, dcol] / cam_scale
    x = (dcol - ppx) * z / fx
    y = (drow - ppy) * z / fy
    cloud = np.stack([x, y, z], axis=1).astype(np.float32)
    return cloud, choose.astype(np.int32), (r0, c0, crop)


class YCBPoseDataset:
    """YCB-Video loader (real frames; the upstream synthetic-blending branch
    is out of scope — the reference never exercises it in this project)."""

    # the two camera intrinsics the upstream loader switches between
    CAM_1 = (1066.778, 1067.487, 312.9869, 241.3109)
    CAM_2 = (1077.836, 1078.189, 323.7872, 279.6921)

    def __init__(self, root: str, data_list: List[str], classes: List[str],
                 num_pt: int = 1000, num_pt_mesh: int = 500, crop: int = 320,
                 seed: int = 0):
        self.root = root
        self.list = data_list
        self.classes = classes
        self.num_pt = num_pt
        self.num_pt_mesh = num_pt_mesh
        self.crop = crop
        self.rng = np.random.default_rng(seed)
        self.cld: Dict[int, np.ndarray] = {}
        for cid, cls in enumerate(classes, start=1):
            path = os.path.join(root, "models", cls, "points.xyz")
            pts = []
            with open(path) as f:
                for line in f:
                    vals = line.split()
                    if len(vals) >= 3:
                        pts.append([float(v) for v in vals[:3]])
            self.cld[cid] = np.asarray(pts, np.float32)

    def get_sym_list(self):
        return [i for i in YCB_SYM_IDS if i < len(self.classes)]

    def __len__(self):
        return len(self.list)

    def __getitem__(self, index: int) -> Optional[Dict]:
        import scipy.io as scio

        stem = self.list[index]
        base = os.path.join(self.root, stem)
        img = np.asarray(Image.open(base + "-color.png").convert("RGB"))
        depth = np.asarray(Image.open(base + "-depth.png"), np.float32)
        label = np.asarray(Image.open(base + "-label.png"))
        meta = scio.loadmat(base + "-meta.mat")
        # upstream rule: synthetic frames and videos >= 0060 use the second
        # camera's intrinsics
        parts = stem.split("/")
        video_id = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
        intr = self.CAM_2 if ("data_syn" in stem or video_id >= 60) \
            else self.CAM_1
        cls_indexes = meta["cls_indexes"].flatten().astype(int)
        pick = self.rng.integers(0, len(cls_indexes))
        obj = int(cls_indexes[pick])
        mask = label == obj
        out = _choose_and_backproject(depth, mask, intr,
                                      float(np.asarray(
                                          meta["factor_depth"]).reshape(-1)[0]),
                                      self.num_pt, self.crop, self.rng)
        if out is None:
            return None
        cloud, choose, (r0, c0, crop) = out
        pose = meta["poses"][:, :, pick]
        target_r, target_t = pose[:, :3], pose[:, 3]
        model = self.cld[obj]
        if len(model) > self.num_pt_mesh:
            keep = self.rng.choice(len(model), self.num_pt_mesh, replace=False)
            model = model[keep]
        target = model @ target_r.T + target_t
        crop_img = img[r0:r0 + crop, c0:c0 + crop].astype(
            np.float32) / 255.0
        crop_img = (crop_img - np.asarray(IMAGENET_MEAN)) / np.asarray(
            IMAGENET_STD)
        return {
            "img": crop_img.astype(np.float32),
            "cloud": cloud, "choose": choose,
            "target": target.astype(np.float32),
            "model_points": model.astype(np.float32),
            "obj_idx": np.int32(obj - 1),
            "is_sym": np.bool_((obj - 1) in self.get_sym_list()),
        }


class LineModPoseDataset:
    """LineMOD-preprocessed loader (gt.yml poses, mm -> m)."""

    INTR = (572.41140, 573.57043, 325.26110, 242.04899)

    def __init__(self, root: str, objects: List[int], mode: str = "train",
                 num_pt: int = 500, num_pt_mesh: int = 500, crop: int = 240,
                 seed: int = 0):
        import yaml  # optional; gated

        self.root = root
        self.num_pt = num_pt
        self.num_pt_mesh = num_pt_mesh
        self.crop = crop
        self.rng = np.random.default_rng(seed)
        self.items: List = []
        self.gt: Dict = {}
        self.cld: Dict[int, np.ndarray] = {}
        for obj in objects:
            seq = os.path.join(root, "data", f"{obj:02d}")
            with open(os.path.join(seq, f"{mode}.txt")) as f:
                frames = [l.strip() for l in f if l.strip()]
            with open(os.path.join(seq, "gt.yml")) as f:
                self.gt[obj] = yaml.safe_load(f)
            self.items.extend((obj, fr) for fr in frames)
            self.cld[obj] = io.read_ply(
                os.path.join(root, "models", f"obj_{obj:02d}.ply")) / 1000.0

    def get_sym_list(self):
        return list(LINEMOD_SYM_IDS)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int) -> Optional[Dict]:
        obj, frame = self.items[index]
        seq = os.path.join(self.root, "data", f"{obj:02d}")
        img = np.asarray(Image.open(
            os.path.join(seq, "rgb", frame + ".png")).convert("RGB"))
        depth = np.asarray(Image.open(
            os.path.join(seq, "depth", frame + ".png")), np.float32)
        mask = np.asarray(Image.open(
            os.path.join(seq, "mask", frame + ".png"))) > 0
        if mask.ndim == 3:
            mask = mask[..., 0]
        entry = next(e for e in self.gt[obj][int(frame)]
                     if e["obj_id"] == obj)
        target_r = np.asarray(entry["cam_R_m2c"], np.float64).reshape(3, 3)
        target_t = np.asarray(entry["cam_t_m2c"], np.float64) / 1000.0
        out = _choose_and_backproject(depth, mask, self.INTR, 1000.0,
                                      self.num_pt, self.crop, self.rng)
        if out is None:
            return None
        cloud, choose, (r0, c0, crop) = out
        model = self.cld[obj]
        if len(model) > self.num_pt_mesh:
            keep = self.rng.choice(len(model), self.num_pt_mesh, replace=False)
            model = model[keep]
        target = model @ target_r.T + target_t
        crop_img = img[r0:r0 + crop, c0:c0 + crop].astype(
            np.float32) / 255.0
        crop_img = (crop_img - np.asarray(IMAGENET_MEAN)) / np.asarray(
            IMAGENET_STD)
        return {
            "img": crop_img.astype(np.float32),
            "cloud": cloud, "choose": choose,
            "target": target.astype(np.float32),
            "model_points": model.astype(np.float32),
            "obj_idx": np.int32(obj - 1),
            "is_sym": np.bool_(obj in LINEMOD_SYM_IDS),
        }


class YCBSegDataset:
    """vanilla_segmentation SegDataset parity
    (/root/reference/DenseFusion/vanilla_segmentation/data_controller.py:17-98):
    random-index sampling of `length` frames per epoch, ColorJitter noise,
    synthetic frames brightened/blurred and composited onto a random real
    frame's background (rgb/label where the syn label is 0), random flips.
    Returns {'image': (H, W, 3) float32 ImageNet-normalized,
    'label': (H, W) int32}."""

    def __init__(self, root: str, data_list: List[str], use_noise: bool,
                 length: int, seed: int = 0):
        import random as _random

        self.root = root
        self.path = list(data_list)
        self.real_path = [p for p in self.path if p.startswith("data/")]
        self.use_noise = use_noise
        self.length = length
        self.rng = _random.Random(seed)
        self.np_rng = np.random.default_rng(seed)

    def __len__(self):
        return self.length

    def _load(self, stem):
        base = os.path.join(self.root, stem)
        rgb = np.asarray(Image.open(base + "-color.png").convert("RGB"),
                         np.float64)
        label = np.asarray(Image.open(base + "-label.png"))
        return rgb, label

    def __getitem__(self, idx: int) -> Dict:
        from ..models.common import IMAGENET_MEAN, IMAGENET_STD
        from . import augment as aug

        index = self.rng.randint(0, max(len(self.path) - 10, 0))
        stem = self.path[index]
        rgb, label = self._load(stem)
        label = label.copy()
        if self.use_noise:
            img = Image.fromarray(rgb.astype(np.uint8))
            rgb = np.asarray(aug.color_jitter(img, rng=self.rng), np.float64)

        if stem.startswith("data_syn"):
            from PIL import ImageEnhance, ImageFilter

            img = Image.open(os.path.join(self.root, stem) + "-color.png") \
                .convert("RGB")
            img = ImageEnhance.Brightness(img).enhance(1.5).filter(
                ImageFilter.GaussianBlur(radius=0.8))
            rgb = np.asarray(aug.color_jitter(img, rng=self.rng), np.float64)
            seed = self.rng.randint(0, max(len(self.path) - 10, 0))
            back_img = Image.fromarray(
                self._load(self.path[seed])[0].astype(np.uint8))
            back = np.asarray(aug.color_jitter(back_img, rng=self.rng),
                              np.float64)
            back_label = self._load(self.path[seed])[1]
            mask = (label == 0)
            rgb = rgb + self.np_rng.normal(0.0, 5.0, rgb.shape)
            rgb = back * mask[..., None] + rgb
            label = back_label * mask + label

        if self.use_noise:
            choice = self.rng.randint(0, 3)
            if choice == 0:
                rgb, label = np.fliplr(rgb), np.fliplr(label)
            elif choice == 1:
                rgb, label = np.flipud(rgb), np.flipud(label)
            elif choice == 2:
                rgb, label = np.flipud(np.fliplr(rgb)), np.flipud(
                    np.fliplr(label))

        img = rgb.astype(np.float32) / 255.0
        img = (img - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
        return {"image": img.astype(np.float32),
                "label": np.ascontiguousarray(label).astype(np.int32)}
