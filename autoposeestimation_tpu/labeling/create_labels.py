"""Label-generation drivers (L2a).

Rebuilds /root/reference/label_generator/create_labels.py and the BS-model
inference entry (/root/reference/background_subtraction/utils.py:648-873):

  * `create_labels`   — classical background-subtraction masks ('gen' mode):
    per sample the jitted create_label_rgbd graph; the reference's per-sample
    parameters (threshold=30, hsv=False, both=True, open=6, close=6,
    remove_one_std=True — create_labels.py:511-524) are the defaults.
  * `create_mask_predictions` — learned BS model ('pred' mode): the 7-channel
    subtraction input + binary U-Net + sum-rule CCA.
  * `create_new_pred_labels` — multi-class model re-labeling with the trust
    checks (BS-copy fallback / depth-overlap / center-crop rejection,
    create_labels.py:164-214).
  * `create_pose_data` — the full Phase A/B/C pipeline (re-label, reconstruct,
    fit pose labels) with the reference's timing stats.
"""
from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.common import normalize_imagenet
from ..ops import bg_subtraction as bgs
from ..ops import cca as cca_ops
from ..utils import io
from . import pose_labels as pose_label_mod


def _measure_dist(meta: Dict, reference_point: np.ndarray) -> Optional[float]:
    if reference_point is None or reference_point.size == 0:
        return None
    pos = io.robot2cam_from_meta(meta)[:3, 3]
    return float(np.linalg.norm(reference_point - pos))


def _foreground_runs(root: str, object_name: str,
                     with_extra: bool = False) -> List[str]:
    runs = io.list_runs(root, object_name)
    if "background" not in runs:
        raise ValueError(
            f"background does not exist for object {object_name}")
    out = [r for r in runs if r != "background"
           and (with_extra or r != "extra")]
    if not out:
        raise ValueError("no foreground")
    return out


def create_labels(object_name: str, root: str,
                  reference_point: Optional[np.ndarray] = None,
                  hsv: bool = False, both: bool = True,
                  threshold: float = 30.0, open_k: int = 6, close_k: int = 6,
                  remove_one_std: bool = True, progress=None) -> int:
    """'gen' mode: classical BS masks for every foreground sample. Returns the
    number of labels written."""
    data_root = os.path.join(io.data_dir(root), object_name)
    bg_dir = os.path.join(data_root, "background")
    bg_ids = io.list_sample_ids(bg_dir)
    count = 0
    for run in _foreground_runs(root, object_name):
        fg_dir = os.path.join(data_root, run)
        save_dir = os.path.join(io.label_dir(root), object_name, run)
        os.makedirs(save_dir, exist_ok=True)
        for stem in bg_ids:
            if not os.path.exists(os.path.join(fg_dir, stem + ".color.png")):
                continue
            bg_rgb = io.read_color(os.path.join(bg_dir, stem + ".color.png"))
            fg_rgb = io.read_color(os.path.join(fg_dir, stem + ".color.png"))
            bg_d = io.read_depth(os.path.join(
                bg_dir, stem + ".depth.png")).astype(np.float32)
            fg_d = io.read_depth(os.path.join(
                fg_dir, stem + ".depth.png")).astype(np.float32)
            meta = io.read_sample_meta(os.path.join(fg_dir,
                                                    stem + ".meta.json"))
            dist = _measure_dist(meta, reference_point)
            label = np.asarray(bgs.create_label_rgbd(
                jnp.asarray(bg_rgb, jnp.float32),
                jnp.asarray(fg_rgb, jnp.float32),
                jnp.asarray(bg_d), jnp.asarray(fg_d),
                jnp.float32(dist if dist is not None else 1050.0),
                threshold=threshold, hsv=hsv, both=both, open_k=open_k,
                close_k=close_k, remove_one_std=remove_one_std))
            io.write_png(os.path.join(save_dir, stem + ".gen.label.png"),
                         label)
            count += 1
            if progress is not None:
                progress(object_name, run, stem)
    return count


def create_mask_predictions(object_name: str, root: str, model, variables,
                            reference_point: Optional[np.ndarray] = None,
                            progress=None) -> int:
    """'pred' mode: learned 7-channel BS model inference -> sum-rule CCA ->
    NNNNNN.pred.label.png (background_subtraction/utils.py:666-873)."""

    @jax.jit
    def infer(x):
        logits = model.apply(variables, x[None])[0]
        probs = jax.nn.softmax(logits, axis=-1)
        mask = jnp.argmax(probs, axis=-1) > 0
        maxprob = jnp.max(probs, axis=-1)
        comp, _ = cca_ops.best_component_mask(mask, maxprob, 0.0, "sum")
        return comp

    data_root = os.path.join(io.data_dir(root), object_name)
    bg_dir = os.path.join(data_root, "background")
    count = 0
    for run in _foreground_runs(root, object_name):
        fg_dir = os.path.join(data_root, run)
        save_dir = os.path.join(io.label_dir(root), object_name, run)
        os.makedirs(save_dir, exist_ok=True)
        for stem in io.list_sample_ids(bg_dir):
            if not os.path.exists(os.path.join(fg_dir, stem + ".color.png")):
                continue
            bg_rgb = io.read_color(os.path.join(bg_dir, stem + ".color.png"))
            fg_rgb = io.read_color(os.path.join(fg_dir, stem + ".color.png"))
            bg_d = io.read_depth(os.path.join(
                bg_dir, stem + ".depth.png")).astype(np.float32)
            fg_d = io.read_depth(os.path.join(
                fg_dir, stem + ".depth.png")).astype(np.float32)
            meta = io.read_sample_meta(os.path.join(fg_dir,
                                                    stem + ".meta.json"))
            dist = _measure_dist(meta, reference_point)
            x = bgs.build_bs_input(
                jnp.asarray(bg_rgb, jnp.float32),
                jnp.asarray(fg_rgb, jnp.float32),
                jnp.asarray(bg_d), jnp.asarray(fg_d),
                jnp.float32(dist if dist is not None else 1050.0))
            comp = np.asarray(infer(x))
            io.write_png(os.path.join(save_dir, stem + ".pred.label.png"),
                         comp.astype(np.uint8) * 255)
            count += 1
            if progress is not None:
                progress(object_name, run, stem)
    return count


def create_new_pred_labels(root: str, classes: Sequence[str], seg_model,
                           seg_variables, reference_point: np.ndarray,
                           get_extra_labels: bool = False,
                           progress=None) -> Dict[str, int]:
    """Phase A: re-label every sample with the trained multi-class model and
    apply the trust checks (create_labels.py:96-214). Returns the stats dict."""

    @jax.jit
    def infer(image, cls_id):
        x = normalize_imagenet(image)[None]
        logits = seg_model.apply(seg_variables, x)[0]
        probs = jax.nn.softmax(logits, axis=-1)
        pred_arg = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        cls_mask = pred_arg == cls_id
        score = jnp.where(cls_mask, jnp.take_along_axis(
            probs, jnp.full(probs.shape[:2] + (1,), cls_id, jnp.int32),
            axis=-1)[..., 0], 0.0)
        comp, found = cca_ops.best_component_mask(cls_mask, score, 0.0,
                                                  "mean_float")
        return comp & found, cls_mask

    stats = {"n_samples": 0, "n_extra_samples": 0, "bs_copied": 0,
             "no_depth_overlap": 0, "not_in_center": 0}
    for class_id, cls in enumerate(classes):
        data_path = os.path.join(io.data_dir(root), cls)
        for run in _foreground_runs(root, cls, with_extra=get_extra_labels):
            run_dir = os.path.join(data_path, run)
            label_path = os.path.join(io.label_dir(root), cls, run)
            os.makedirs(label_path, exist_ok=True)
            for stem in io.list_sample_ids(run_dir):
                meta = io.read_sample_meta(
                    os.path.join(run_dir, stem + ".meta.json"))
                dist = _measure_dist(meta, reference_point)
                depth = io.read_depth(os.path.join(
                    run_dir, stem + ".depth.png")).astype(np.float64)
                if dist is not None:
                    depth[(depth > dist + 150) | (depth < dist - 150)] = 0
                image = io.read_color(os.path.join(run_dir,
                                                   stem + ".color.png"))
                comp, cls_mask = infer(jnp.asarray(image),
                                       jnp.int32(class_id + 1))
                pred = np.asarray(comp).astype(np.uint8) * 255

                save = False
                if run != "extra":
                    bs_path = os.path.join(label_path,
                                           stem + ".pred.label.png")
                    bs_label = (io.read_label(bs_path)
                                if os.path.exists(bs_path)
                                else np.zeros_like(pred))
                    # no overlap with the BS label -> fall back to it
                    if len(np.unique(pred[bs_label != 0])) <= 1:
                        pred = bs_label
                        save = True
                        stats["bs_copied"] += 1

                if not save:
                    if len(np.unique(pred[depth != 0])) <= 1:
                        stats["no_depth_overlap"] += 1
                    else:
                        s0, s1 = pred.shape
                        cut0, cut1 = 30, 50
                        if len(np.unique(
                                pred[cut0:s0 - cut0, cut1:s1 - cut1])) > 1:
                            save = True
                        else:
                            stats["not_in_center"] += 1

                new_path = os.path.join(label_path,
                                        stem + ".new_pred.label.png")
                meta_path = os.path.join(label_path, stem + ".meta.json")
                if save:
                    stats["n_extra_samples" if run == "extra"
                          else "n_samples"] += 1
                    io.write_png(new_path, pred)
                else:
                    for p in (new_path, meta_path):
                        if os.path.exists(p):
                            os.remove(p)
                if progress is not None:
                    progress(cls, run, stem, save)
    return stats


def create_pose_data(root: str, classes: Sequence[str], ds_name: str,
                     seg_model, seg_variables,
                     reference_point: np.ndarray,
                     new_pred: bool = True, get_extra_labels: bool = False,
                     n_viewpoints: int = 30, global_regression: bool = False,
                     progress=None, data_parallel: str = "auto") -> Dict:
    """The heavyweight offline pipeline: Phase A re-labeling, Phase B
    reconstruction, Phase C pose-label fitting — with the reference's
    per-phase timing stats (create_labels.py:216-280) and hyperparameters
    (:219-232). data_parallel ('auto'/'on'/'off', parallel.mesh.auto_mesh
    semantics): with >1 device, Phase B's per-view surface extraction runs
    view-sharded across the mesh 'data' axis."""
    from ..parallel import mesh as pmesh
    from ..reconstruction import create_pointcloud as rec

    mesh = pmesh.auto_mesh(data_parallel)

    mode = "new_pred" if new_pred else "pred"
    times = {"seg": [], "pc": [], "pose": []}
    stats: Dict = {}

    t0 = time.time()
    if new_pred:
        stats = create_new_pred_labels(root, classes, seg_model,
                                       seg_variables, reference_point,
                                       get_extra_labels, progress=progress)
    times["seg"].append(time.time() - t0)

    for cls in classes:
        t1 = time.time()
        rec.load_point_cloud(
            cls, io.pc_dir(root), root, reference_point=reference_point,
            mode=mode, n_viewpoints=n_viewpoints, min_friends=20, min_dist=5,
            nb_neighbors=20, threshold=10, voxel_size=2, voxel_size_out=5,
            global_regression=global_regression, icp_point2point=True,
            icp_point2plane=False, mesh=mesh)
        times["pc"].append(time.time() - t1)

        t2 = time.time()
        pose_label_mod.create_pose_label(root, cls,
                                         with_extra=get_extra_labels,
                                         global_regression=global_regression)
        times["pose"].append(time.time() - t2)

    return {"stats": stats, "times": times}
