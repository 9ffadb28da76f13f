"""Learned background-subtraction (7-channel) dataset.

Parity with /root/reference/background_subtraction/dataset.py + utils.py:
  * n samples per class from the background + first foreground run,
  * train/test split 80/20 *by object class* (__init__.py:43-48),
  * synchronized augmentation: one rotation angle + flips applied identically
    to bg/fg RGB, HSV, depth and the label (utils.py:414-626),
  * depth killed where the other frame is 0, absolute differences, 7-channel
    concat (|dRGB|, |dHSV|, |ddepth|), fixed mean/std normalization,
  * binary label from the stored gen/GT mask.
"""
from __future__ import annotations

import os
import random
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from ..ops.bg_subtraction import BS_MEAN, BS_STD
from ..utils import io


class BSDataset:
    def __init__(self, root: str, mode: str = "train",
                 samples_per_class: int = 23, p_test: float = 0.2,
                 label_mode: str = "gen", seed: int = 0,
                 augment: bool = True):
        self.root = root
        self.mode = mode
        self.augment = augment and mode == "train"
        self.rng = random.Random(seed)
        self.label_mode = label_mode

        objects = io.list_objects(root)
        rng = random.Random(1234)  # split must be stable across modes
        objects = sorted(objects)
        rng.shuffle(objects)
        n_test = max(int(len(objects) * p_test), 1) if len(objects) > 1 else 0
        test_objects = objects[:n_test]
        chosen = (test_objects if mode == "test"
                  else [o for o in objects if o not in test_objects])

        self.samples: List = []
        for obj in chosen:
            runs = [r for r in io.list_runs(root, obj)
                    if r not in ("background", "extra")]
            if not runs:
                continue
            run = runs[0]
            run_dir = os.path.join(io.data_dir(root), obj, run)
            ids = io.list_sample_ids(run_dir)[:samples_per_class]
            for stem in ids:
                self.samples.append((obj, run, stem))

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int) -> Optional[Dict[str, np.ndarray]]:
        obj, run, stem = self.samples[index]
        dd = io.data_dir(self.root)
        bg = os.path.join(dd, obj, "background", stem)
        fg = os.path.join(dd, obj, run, stem)

        b_img = Image.open(bg + ".color.png").convert("RGB")
        f_img = Image.open(fg + ".color.png").convert("RGB")
        b_depth = Image.open(bg + ".depth.png")
        f_depth = Image.open(fg + ".depth.png")
        label = Image.open(os.path.join(
            io.label_dir(self.root), obj, run,
            f"{stem}.{self.label_mode}.label.png"))

        if self.augment:
            angle = self.rng.uniform(-180.0, 180.0)
            hflip = self.rng.random() < 0.5
            vflip = self.rng.random() < 0.5

            def tx(im):
                im = im.rotate(angle)
                if hflip:
                    im = im.transpose(Image.FLIP_LEFT_RIGHT)
                if vflip:
                    im = im.transpose(Image.FLIP_TOP_BOTTOM)
                return im

            b_img, f_img = tx(b_img), tx(f_img)
            b_depth, f_depth = tx(b_depth), tx(f_depth)
            label = tx(label)

        b_rgb = np.asarray(b_img, np.float32)
        f_rgb = np.asarray(f_img, np.float32)
        b_hsv = np.asarray(b_img.convert("HSV"), np.float32)
        f_hsv = np.asarray(f_img.convert("HSV"), np.float32)
        b_d = np.asarray(b_depth, np.float32)
        f_d = np.asarray(f_depth, np.float32)

        # kill depth where the other frame has no measurement (utils.py:549-550)
        f_d = np.where(b_d == 0, 0.0, f_d)
        b_d = np.where(f_d == 0, 0.0, b_d)

        x = np.concatenate([
            np.abs(f_rgb - b_rgb),
            np.abs(f_hsv - b_hsv),
            np.abs(f_d - b_d)[..., None],
        ], axis=2)
        x = np.asarray(x, np.uint8).astype(np.float32) / 255.0  # wrap parity
        x = (x - np.asarray(BS_MEAN)) / np.asarray(BS_STD)

        target = (np.asarray(label, np.uint8) == 255).astype(np.int32)
        return {"image": x.astype(np.float32), "label": target}
