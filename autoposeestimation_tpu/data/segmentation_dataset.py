"""Multi-class segmentation dataset over the on-disk contract.

Parity with /root/reference/segmentation/dataset.py: reads the data list +
classes of a `segmentation` dataset, remaps each sample's binary 255-label to
its class id, optionally computes the per-dataset channel mean/std, and (train
mode) applies ColorJitter -> rotate(+-180) -> CropAndZoom before normalizing.
Train samples are square output_size crops; test samples are the full frame.
"""
from __future__ import annotations

import os
import random
from typing import Dict, Tuple

import numpy as np
from PIL import Image

from ..models.common import IMAGENET_MEAN, IMAGENET_STD
from ..utils import io
from . import augment


class SegmentationDataset:
    def __init__(self, root: str, data_set_name: str, mode: str = "train",
                 label_mode: str = "gen", use_imagenet_stats: bool = True,
                 output_size: int = 480, seed: int = 0):
        self.root = root
        self.mode = mode
        self.label_mode = label_mode
        self.output_size = output_size
        ds_dir = io.dataset_dir(root, "segmentation", data_set_name)
        self.classes = io.read_lines(os.path.join(ds_dir, "classes.txt"))
        list_name = ("train_data_list.txt" if mode == "train"
                     else "test_data_list.txt")
        self.items = io.read_lines(os.path.join(ds_dir, list_name))
        self.data_root = io.data_dir(root)
        self.label_root = io.label_dir(root)
        self.rng = random.Random(seed)

        if use_imagenet_stats:
            self.mean = np.asarray(IMAGENET_MEAN, np.float32)
            self.std = np.asarray(IMAGENET_STD, np.float32)
        else:
            self.mean, self.std = self.compute_stats()

    def compute_stats(self) -> Tuple[np.ndarray, np.ndarray]:
        """Per-dataset channel mean/std over the training images
        (dataset.py:68-83)."""
        acc = np.zeros(3)
        acc2 = np.zeros(3)
        n = 0
        for stem in self.items:
            img = io.read_color(os.path.join(
                self.data_root, stem + ".color.png")).astype(np.float64) / 255.0
            acc += img.mean(axis=(0, 1))
            acc2 += (img ** 2).mean(axis=(0, 1))
            n += 1
        mean = acc / max(n, 1)
        std = np.sqrt(np.maximum(acc2 / max(n, 1) - mean ** 2, 1e-12))
        return mean.astype(np.float32), std.astype(np.float32)

    def class_id(self, stem: str) -> int:
        """Class id = 1 + index of the object (directory) name; 0 = background."""
        return 1 + self.classes.index(stem.split("/")[0])

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        stem = self.items[index]
        img = Image.open(os.path.join(self.data_root, stem + ".color.png")) \
            .convert("RGB")
        label = Image.open(os.path.join(
            self.label_root, f"{stem}.{self.label_mode}.label.png"))

        if self.mode == "train":
            img = augment.color_jitter(img, rng=self.rng)
            angle = self.rng.uniform(-180.0, 180.0)
            img, label = augment.rotate_joint(angle, img, label)
            img, label = augment.CropAndZoom(
                self.output_size, rng=self.rng)(img, label)

        image = np.asarray(img, np.float32) / 255.0
        image = (image - self.mean) / self.std
        label_np = np.asarray(label, np.uint8)
        target = np.zeros(label_np.shape[:2], np.int32)
        target[label_np == 255] = self.class_id(stem)
        return {"image": image.astype(np.float32), "label": target}
