"""Experiment sweeps: train-over-grid + evaluate-over-runs.

Parity with /root/reference/experiments/train_pose_estimation_exp.py (train
DenseFusion across a grid of p_viewpoints / p_extra_data / label_mode with
wall-time stats JSON) and experiments/eval_exp.py (evaluate every trained run
in a directory, dumping <exp>_exp_eval_results.json).
"""
from __future__ import annotations

import itertools
import json
import os
import time
from typing import Dict, Optional, Sequence

import numpy as np

from ..data import loader, pose_dataset
from ..train import checkpoints, densefusion as dft
from ..utils import io
from . import eval as eval_mod


def train_pose_estimation_exp(root: str, ds_name: str,
                              p_viewpoints_grid: Sequence[float] = (1.0,),
                              p_extra_data_grid: Sequence[float] = (0.0,),
                              label_modes: Sequence[str] = ("new_pred",),
                              epochs: int = 3,
                              cfg: Optional[dft.DFConfig] = None,
                              out_base: Optional[str] = None) -> Dict:
    """Train one run per grid point; returns (and writes) wall-time stats."""
    classes = io.read_lines(os.path.join(
        io.dataset_dir(root, "pose_estimation", ds_name), "classes.txt"))
    out_base = out_base or os.path.join(root, "experiments", "pose_runs",
                                        ds_name)
    stats: Dict = {"runs": [], "total_seconds": 0.0}
    for pv, pe, mode in itertools.product(p_viewpoints_grid,
                                          p_extra_data_grid, label_modes):
        run_name = f"pv{pv}_pe{pe}_{mode}"
        run_cfg = cfg or dft.DFConfig()
        t0 = time.time()
        state = dft.create_trainer(num_obj=len(classes), cfg=run_cfg)
        train_ds = pose_dataset.PoseDataset(
            root, ds_name, mode="train", num_pt=run_cfg.num_points,
            num_pt_mesh=run_cfg.num_points_mesh, label_mode=mode,
            p_viewpoints=pv, p_extra_data=pe)
        test_ds = pose_dataset.PoseDataset(
            root, ds_name, mode="test", num_pt=run_cfg.num_points,
            num_pt_mesh=run_cfg.num_points_mesh)
        out_dir = os.path.join(out_base, run_name)
        dft.train(state,
                  lambda: loader.Loader(train_ds, run_cfg.batch_size),
                  lambda: loader.Loader(test_ds, run_cfg.batch_size,
                                        shuffle=False, drop_last=False),
                  out_dir=out_dir, epochs=epochs)
        elapsed = time.time() - t0
        stats["runs"].append({
            "name": run_name, "p_viewpoints": pv, "p_extra_data": pe,
            "label_mode": mode, "seconds": elapsed,
            "best_test": state.best_test,
        })
        stats["total_seconds"] += elapsed
    io.write_json(os.path.join(out_base, "sweep_stats.json"), stats)
    return stats


def eval_exp(root: str, ds_name: str, runs_dir: Optional[str] = None,
             exp_name: str = "exp",
             cfg: Optional[dft.DFConfig] = None) -> Dict:
    """Evaluate every trained run under runs_dir; writes
    <exp>_exp_eval_results.json (eval_exp.py parity)."""
    cfg = cfg or dft.DFConfig()
    classes = io.read_lines(os.path.join(
        io.dataset_dir(root, "pose_estimation", ds_name), "classes.txt"))
    runs_dir = runs_dir or os.path.join(root, "experiments", "pose_runs",
                                        ds_name)
    test_ds = pose_dataset.PoseDataset(
        root, ds_name, mode="test", num_pt=cfg.num_points,
        num_pt_mesh=cfg.num_points_mesh)

    results: Dict = {}
    for run in sorted(os.listdir(runs_dir)):
        run_dir = os.path.join(runs_dir, run)
        model_path = os.path.join(run_dir, "pose_model.npz")
        if not os.path.isdir(run_dir) or not os.path.exists(model_path):
            continue
        state = dft.create_trainer(num_obj=len(classes), cfg=cfg)
        state.pose_vars = checkpoints.load_checkpoint(
            model_path, like_variables=state.pose_vars)["variables"]
        refine_path = os.path.join(run_dir, "pose_refine_model.npz")
        refine = os.path.exists(refine_path)
        if refine:
            state.refine_vars = checkpoints.load_checkpoint(
                refine_path, like_variables=state.refine_vars)["variables"]
            state.refine_start = True
        results[run] = eval_mod.evaluate(
            state,
            lambda: loader.Loader(test_ds, cfg.batch_size, shuffle=False,
                                  drop_last=False),
            classes, refine=refine, iteration=cfg.iteration)
    out_path = os.path.join(runs_dir, f"{exp_name}_exp_eval_results.json")
    io.write_json(out_path, results)
    return results


def plot_pose_exp_results(runs_dir: str) -> Dict:
    """Parse per-run losses.json and report best estimator/refiner distances
    + their epochs (plot_pose_exp_results.py:62-94 parity, data only —
    rendering is the caller's concern)."""
    out: Dict = {}
    for run in sorted(os.listdir(runs_dir)):
        path = os.path.join(runs_dir, run, "losses.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            curves = json.load(f).get("curves", {})
        test = curves.get("test_dists", [])
        if not test:
            continue
        best_idx = int(np.argmin(test))
        out[run] = {
            "best_test_dis": float(test[best_idx]),
            "best_epoch": best_idx,
            "final_test_dis": float(test[-1]),
            "n_epochs": len(test),
        }
    return out
