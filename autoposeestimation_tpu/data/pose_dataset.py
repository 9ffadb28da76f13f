"""DenseFusion pose dataset over the on-disk contract.

Parity with /root/reference/DenseFusion/datasets/myDatasetAugmented/dataset.py
(the variant the live trainer uses), with the TPU batching change: instead of
the reference's variable 40-px-quantized bbox crops (which force bs=1), every
sample is cropped through a *static* `crop`-sized window centered on the mask
bbox — one compiled shape for the whole dataset.

Features preserved:
  * p_viewpoints viewpoint subsampling + extra-sample mixing filtered by the
    selected viewpoints (dataset.py:57-96),
  * per-class .xyz model clouds (mm->m) + symmetric flags from meta
    (dataset.py:102-141),
  * train-time augmentation: ColorJitter(0.2,0.2,0.2,0.05), in-plane rotation
    of img/label/depth with the matching cam2robot correction
    cam2robot = inv(Rz)) @ cam2robot (dataset.py:204-221), +-noise_trans
    translation noise on cloud+target,
  * mask&depth choose of num_pt pixels with shuffle-subsample / wrap-pad,
  * per-sample intrinsics backprojection to meters.
"""
from __future__ import annotations

import os
import random
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from ..models.common import IMAGENET_MEAN, IMAGENET_STD
from ..utils import io


class PoseDataset:
    def __init__(self, root: str, data_set_name: str, mode: str = "train",
                 num_pt: int = 1000, add_noise: bool = True,
                 noise_trans: float = 0.03, label_mode: str = "new_pred",
                 p_extra_data: float = 0.0, p_viewpoints: float = 1.0,
                 num_pt_mesh: int = 1000, crop: int = 320, seed: int = 0,
                 crop_and_zoom: bool = False, return_raw: bool = False,
                 rot_degrees: float = 180.0, pose_source: str = "tf_chain"):
        # pose_source: "tf_chain" composes cam2robot @ robot2object (the
        # myDatasetAugmented behavior, dataset.py:130-141); "meta_fields"
        # reads the label meta's camera-frame position/rotation directly —
        # the myDataset variant's convention
        # (/root/reference/DenseFusion/datasets/myDataset/dataset.py:170-171)
        self.pose_source = pose_source
        # rot_degrees: in-plane rotation augmentation range (reference
        # default +-180, dataset.py:204-221); small datasets may want a
        # narrower range — full SO(2) equivariance from few base views is a
        # disproportionately hard ask
        self.rot_degrees = rot_degrees
        # return_raw: test-mode extras like the reference
        # (dataset.py:310-318) — full raw image + intrinsics vector for the
        # per-epoch prediction-panel dumps (train.py:256-317)
        self.return_raw = return_raw
        # crop_and_zoom: the myDatasetAugmented2 experiment variant
        # (/root/reference/DenseFusion/datasets/myDatasetAugmented2/
        # dataset.py:139-146): random label-driven zoom crops with the
        # intrinsics rewritten to the crop frame
        self.crop_and_zoom = crop_and_zoom
        ds_dir = io.dataset_dir(root, "pose_estimation", data_set_name)
        self.mode = mode
        self.num_pt = num_pt
        self.num_pt_mesh = num_pt_mesh
        self.add_noise = add_noise and mode == "train"
        self.noise_trans = noise_trans
        self.label_mode = label_mode
        self.crop = crop
        self.data_root = io.data_dir(root)
        self.label_root = io.label_dir(root)
        self.seed = seed
        self.rng = random.Random(seed)
        self.np_rng = np.random.default_rng(seed)

        list_name = ("train_data_list.txt" if mode == "train"
                     else "test_data_list.txt")
        self.items: List[str] = io.read_lines(os.path.join(ds_dir, list_name))

        self.extra_items: List[str] = []
        self.n_extra_samples = 0
        if mode == "train":
            # viewpoint subsampling (dataset.py:57-72): viewpoint ids are the
            # 6-digit stems of the first run
            if p_viewpoints < 1.0 and self.items:
                first_run = "/".join(self.items[0].split("/")[:2])
                vp_ids = [s[-6:] for s in self.items
                          if s.startswith(first_run)]
                self.np_rng.shuffle(vp_ids)
                keep = set(vp_ids[: int(len(vp_ids) * p_viewpoints)])
                self.items = [s for s in self.items if s[-6:] in keep]
            else:
                keep = {s[-6:] for s in self.items}
            extra_path = os.path.join(ds_dir, "extra_train_data_list.txt")
            if p_extra_data > 0 and os.path.exists(extra_path):
                keep_ids = {int(v) for v in keep}
                for stem in io.read_lines(extra_path):
                    meta = io.read_sample_meta(os.path.join(
                        self.data_root, stem + ".meta.json"))
                    if meta["view_point_id"] in keep_ids:
                        self.extra_items.append(stem)
                self.n_extra_samples = int(len(self.items) * p_extra_data)

        self.classes = io.read_lines(os.path.join(ds_dir, "classes.txt"))
        self.cld: Dict[int, np.ndarray] = {}
        self.symmetry_obj_idx: List[int] = []
        for cid, cls in enumerate(self.classes):
            pts = io.read_xyz(os.path.join(io.pc_dir(root), cls,
                                           cls + ".xyz")) / 1000.0
            self.cld[cid] = pts.astype(np.float32)
            obj_dir = os.path.join(self.data_root, cls)
            run = sorted(os.listdir(obj_dir))[0]
            run_dir = os.path.join(obj_dir, run)
            metas = sorted(f for f in os.listdir(run_dir)
                           if f.endswith(".meta.json"))
            meta = io.read_sample_meta(os.path.join(run_dir, metas[0]))
            if bool(meta.get("symmetric", 0)):
                self.symmetry_obj_idx.append(cid)

    def get_sym_list(self) -> List[int]:
        return self.symmetry_obj_idx

    def __len__(self) -> int:
        return len(self.items) + self.n_extra_samples

    def _load(self, stem: str, label_mode: str):
        img = Image.open(os.path.join(
            self.data_root, stem + ".color.png")).convert("RGB")
        depth = Image.open(os.path.join(self.data_root, stem + ".depth.png"))
        image_meta = io.read_sample_meta(os.path.join(
            self.data_root, stem + ".meta.json"))
        label = Image.open(os.path.join(
            self.label_root, f"{stem}.{label_mode}.label.png"))
        meta = io.read_pose_label_meta(os.path.join(
            self.label_root, stem + ".meta.json"))
        return img, depth, label, image_meta, meta

    def __getitem__(self, index: int) -> Optional[Dict[str, np.ndarray]]:
        if index < len(self.items):
            stem = self.items[index]
            label_mode = self.label_mode
        else:
            stem = self.extra_items[self.rng.randrange(len(self.extra_items))]
            label_mode = "new_pred"
        img, depth, label, image_meta, meta = self._load(stem, label_mode)
        # test mode draws points from a per-item stream so every epoch's
        # eval (and the post-training eval) sees the *same* subsample —
        # otherwise best-checkpoint selection is a min over sampling noise
        # and unreproducible (round-2 demo defect)
        item_rng = (self.np_rng if self.mode == "train"
                    else np.random.default_rng((self.seed, index)))
        intr = image_meta["intr"]
        obj = self.classes.index(meta["cls_name"])

        augment_rotation = np.eye(4)
        if self.add_noise:
            from . import augment as aug

            img = aug.color_jitter(img, rng=self.rng)
            angle = self.rng.uniform(-self.rot_degrees, self.rot_degrees)
            augment_rotation[:3, :3] = _rot_z(np.deg2rad(angle))
            img, label, depth = aug.rotate_joint(angle, img, label, depth)

        if self.pose_source == "meta_fields":
            cam2object = np.eye(4)
            cam2object[:3, :3] = meta["rotation"]
            cam2object[:3, 3] = meta["position"]
        else:
            cam2object = meta["cam2robot"] @ meta["robot2object"]
        if self.add_noise:
            cam2object = np.linalg.inv(augment_rotation) @ cam2object
        target_r = cam2object[:3, :3]
        target_t = cam2object[:3, 3] / 1000.0  # to meters

        fx, fy, ppx, ppy = intr.fx, intr.fy, intr.ppx, intr.ppy
        if self.crop_and_zoom and self.mode == "train":
            from PIL import Image as PILImage

            from . import augment as aug

            caz = aug.CropAndZoom(self.crop, rng=self.rng)
            box = caz.compute_box(np.asarray(label))
            l_, u_, r_, d_ = box
            sx = self.crop / max(r_ - l_, 1)
            sy = self.crop / max(d_ - u_, 1)
            img = img.crop(box).resize((self.crop, self.crop))
            label = label.crop(box).resize((self.crop, self.crop),
                                           PILImage.NEAREST)
            depth = depth.crop(box).resize((self.crop, self.crop),
                                           PILImage.NEAREST)
            # intrinsics rewritten to the zoomed crop frame
            # (myDatasetAugmented2 behavior)
            fx, fy = fx * sx, fy * sy
            ppx, ppy = (ppx - l_) * sx, (ppy - u_) * sy

        img_np = np.asarray(img, np.uint8)
        label_np = np.asarray(label, np.uint8)
        depth_np = np.asarray(depth, np.float32)

        mask = (label_np == 255) & (depth_np != 0)
        if not mask.any():
            return None
        h, w = label_np.shape
        # clamp the static window to the frame (small test images), keeping
        # the PSPNet stride-8 requirement
        crop = min(self.crop, h, w)
        crop -= crop % 8
        # dynamic zoom window >= crop covering the 40-px-quantized bbox
        # (reference get_bbox ladder, dataset.py:342-380) — the EXACT numpy
        # twin of the serving graph's zoom_window_bbox, so training and
        # serving crops are the same function of the mask; objects larger
        # than the static crop are zoomed instead of truncated
        from ..ops.projection import zoom_window_bbox_np

        r0, c0, win = zoom_window_bbox_np(label_np == 255, crop, h, w)

        # candidate pixels are the (crop, crop) resample LATTICE of the
        # window — the EXACT pixel set the serving graph samples
        # (ops/projection.backproject_choose_zoom); for win == crop (every
        # object whose quantized bbox fits) the lattice IS the full window.
        # Mirroring the lattice here removes the r2-advisor's train/serve
        # skew for oversized objects.
        ii = r0 + (np.arange(crop) * win) // crop
        jj = c0 + (np.arange(crop) * win) // crop
        lat_mask = mask[np.ix_(ii, jj)]
        choose = lat_mask.flatten().nonzero()[0]
        if len(choose) == 0:
            return None
        if len(choose) > self.num_pt:
            # stratified rank draw — the same rule as the serving graph's
            # choose_masked_indices (one uniform pick per rank stratum)
            cnt = len(choose)
            j = np.arange(self.num_pt)
            lo = (j * cnt) // self.num_pt
            hi = ((j + 1) * cnt) // self.num_pt
            ranks = lo + (item_rng.random(self.num_pt) * (hi - lo)).astype(int)
            choose = choose[ranks]
        else:
            choose = np.pad(choose, (0, self.num_pt - len(choose)), "wrap")

        drow = ii[choose // crop]
        dcol = jj[choose % crop]
        z = depth_np[drow, dcol] * image_meta["depth_scale"]
        x = (dcol - ppx) * z / fx
        y = (drow - ppy) * z / fy
        cloud = np.stack([x, y, z], axis=1).astype(np.float32)

        if self.add_noise:
            add_t = self.np_rng.uniform(-self.noise_trans, self.noise_trans, 3)
            cloud = cloud + add_t

        model = self.cld[obj]
        if len(model) > self.num_pt_mesh:
            dell = item_rng.choice(len(model), len(model) - self.num_pt_mesh,
                                   replace=False)
            model = np.delete(model, dell, axis=0)
        elif len(model) < self.num_pt_mesh:
            idx2 = np.arange(self.num_pt_mesh) % len(model)
            model = model[idx2]

        target = model @ target_r.T + target_t
        if self.add_noise:
            target = target + add_t
            target_t = target_t + add_t

        # nearest-resample the (win, win) color window onto the static crop
        # grid (identity slice when win == crop); choose already addresses
        # the crop grid (it indexes the lattice directly)
        img_crop = img_np[np.ix_(ii, jj)].astype(np.float32) / 255.0
        img_crop = (img_crop - np.asarray(IMAGENET_MEAN)) / np.asarray(
            IMAGENET_STD)
        choose = choose.astype(np.int32)

        out = {
            "img": img_crop.astype(np.float32),
            "cloud": cloud.astype(np.float32),
            "choose": choose.astype(np.int32),
            "target": target.astype(np.float32),
            "model_points": model.astype(np.float32),
            "obj_idx": np.int32(obj),
            "is_sym": np.bool_(obj in self.symmetry_obj_idx),
            # ground-truth pose for translation/rotation error metrics —
            # ADD-S on near-symmetric objects absorbs translation error, so
            # grasp-relevant eval needs the raw pose too
            "target_t": target_t.astype(np.float32),
            "target_r": target_r.astype(np.float32),
        }
        if self.return_raw:
            out["raw_img"] = img_np.astype(np.uint8)
            out["intr"] = np.asarray([fx, fy, ppx, ppy], np.float32)
        return out


def _rot_z(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
