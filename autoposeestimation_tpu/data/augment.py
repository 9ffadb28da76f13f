"""Host-side image augmentations (numpy/PIL) shared by the datasets.

Parity targets: torchvision ColorJitter(0.2, 0.2, 0.2, 0.05) as used by the
pose dataset (/root/reference/DenseFusion/datasets/myDatasetAugmented/dataset.py:147),
PIL-rotate joint augmentation, and the label-driven CropAndZoom of the
segmentation trainer (/root/reference/segmentation/utils.py:361-487).
Augmentation is input-pipeline work and stays on host; the device graph only
ever sees fixed-shape batches.
"""
from __future__ import annotations

import random
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image, ImageEnhance


def color_jitter(img: Image.Image, brightness=0.2, contrast=0.2,
                 saturation=0.2, hue=0.05,
                 rng: Optional[random.Random] = None) -> Image.Image:
    """torchvision-equivalent ColorJitter (random order of the four ops)."""
    rng = rng or random
    ops = []
    if brightness:
        f = rng.uniform(max(0, 1 - brightness), 1 + brightness)
        ops.append(lambda im: ImageEnhance.Brightness(im).enhance(f))
    if contrast:
        f2 = rng.uniform(max(0, 1 - contrast), 1 + contrast)
        ops.append(lambda im: ImageEnhance.Contrast(im).enhance(f2))
    if saturation:
        f3 = rng.uniform(max(0, 1 - saturation), 1 + saturation)
        ops.append(lambda im: ImageEnhance.Color(im).enhance(f3))
    if hue:
        sh = rng.uniform(-hue, hue)

        def hue_shift(im):
            hsv = np.array(im.convert("HSV"), dtype=np.int16)
            hsv[..., 0] = (hsv[..., 0] + int(sh * 255)) % 256
            return Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB")

        ops.append(hue_shift)
    idx = list(range(len(ops)))
    rng.shuffle(idx)
    for i in idx:
        img = ops[i](img)
    return img


def rotate_joint(angle: float, img: Image.Image, label: Image.Image,
                 depth: Optional[Image.Image] = None):
    """Rotate image(+label+depth) about the center (PIL semantics: bilinear
    for none of them — PIL rotate defaults to NEAREST)."""
    out = [img.rotate(angle), label.rotate(angle)]
    if depth is not None:
        out.append(depth.rotate(angle))
    return out


class CropAndZoom:
    """Label-driven random square crop + resize (segmentation/utils.py:361-487).

    output_size defaults to 480 like the reference; min zoom window is
    output_size / max_zoom.
    """

    def __init__(self, output_size: int = 480, bbox_increase: float = 1.1,
                 to_small: float = 0.8, to_big: float = 1.2,
                 max_zoom: float = 2.0,
                 rng: Optional[random.Random] = None):
        self.output_size = output_size
        self.bbox_increase = bbox_increase
        self.to_small = to_small
        self.to_big = to_big
        self.max_l = output_size
        self.min_l = int(float(output_size) / max_zoom)
        self.rng = rng or random

    @staticmethod
    def _extremes(label: np.ndarray) -> np.ndarray:
        pos = np.where(label == 255)
        if len(pos[0]) == 0:
            h, w = label.shape[:2]
            return np.asarray([0, h - 1, 0, w - 1])
        return np.asarray([pos[0].min(), pos[0].max(),
                           pos[1].min(), pos[1].max()])

    @staticmethod
    def _size(ext) -> Tuple[int, int, List[int]]:
        h = ext[1] - ext[0]
        w = ext[3] - ext[2]
        return h, w, [ext[0] + int(h / 2), ext[2] + int(w / 2)]

    @staticmethod
    def _bbox(c, l) -> List[int]:
        half = int(l / 2)
        return [c[0] - half, c[0] + half, c[1] - half, c[1] + half]

    def _inside(self, bbox, size) -> List[int]:
        move = [0, 0]
        if bbox[0] < 0:
            move[0] = bbox[0]
        elif bbox[1] > size[0]:
            move[0] = bbox[1] - size[0]
        if bbox[2] < 0:
            move[1] = bbox[2]
        elif bbox[3] > size[1]:
            move[1] = bbox[3] - size[1]
        return [bbox[0] - move[0], bbox[1] - move[0],
                bbox[2] - move[1], bbox[3] - move[1]]

    def compute_box(self, label_np: np.ndarray):
        """The label-driven crop box as a PIL (left, upper, right, lower)
        tuple — shared by the joint image/label crop and the pose-dataset
        variant that also crops depth and rewrites intrinsics."""
        size = label_np.shape  # (h, w)
        ext = self._extremes(label_np)
        h, w, c = self._size(ext)
        h_ratio = float(max(h, 1)) / self.output_size
        w_ratio = float(max(w, 1)) / self.output_size
        h_w_ratio = h_ratio / max(w_ratio, 1e-9)
        ls = [h, w]
        bigger = 1 if w_ratio > h_ratio else 0

        bbox = self._bbox(c, ls[bigger] * self.bbox_increase)
        zoom = int(self.rng.uniform(self.min_l, self.max_l))
        _, _, bc = self._size(bbox)
        bbox = self._bbox(bc, zoom)
        bh, bw, bc = self._size(bbox)

        if self.to_small <= h_w_ratio <= self.to_big:
            if bh <= size[0] and bw <= size[0]:
                bbox = self._inside(bbox, size)
            else:
                bc[1] = int(bc[1] - w / 2) + self.rng.randint(0, max(w, 1))
                bbox = self._bbox(bc, size[0] - 2)
                bbox = self._inside(bbox, size)
        else:
            bc[bigger] = (int(bc[bigger] - ls[bigger] / 2)
                          + self.rng.randint(0, max(ls[bigger], 1)))
            bbox = self._bbox(bc, bh)
            bh, bw, bc = self._size(bbox)
            if bh <= size[0] and bw <= size[0]:
                bbox = self._inside(bbox, size)
            else:
                bbox = self._bbox(bc, size[0] - 2)
                bbox = self._inside(bbox, size)

        return [bbox[2], bbox[0], bbox[3], bbox[1]]  # PIL (l, u, r, d)

    def __call__(self, img: Image.Image, label: Image.Image):
        box = self.compute_box(np.array(label))
        img = img.crop(box).resize((self.output_size, self.output_size))
        label = label.crop(box).resize((self.output_size, self.output_size),
                                       resample=Image.NEAREST)
        return img, label
