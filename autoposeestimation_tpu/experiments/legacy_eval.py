"""Legacy benchmark evaluation drivers: YCB-Video and LineMOD.

Inventory parity with the upstream eval scripts the reference vendors
(/root/reference/DenseFusion/tools/eval_ycb.py, eval_linemod.py): run the
estimator + refiner over a benchmark test list and report per-class ADD(-S)
with the benchmark's success criterion (<2 cm for YCB, <10% of object
diameter for LineMOD). Results go to JSON rather than the MATLAB-toolbox .mat
files of the upstream scripts.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..data import legacy_datasets, loader
from ..train import densefusion as dft
from ..utils import io


def _run_eval(state: "dft.TrainerState", dataset, classes: List[str],
              batch_size: int, threshold_fn) -> Dict:
    results: Dict = {cls: {"dis": [], "hit": 0, "miss": 0}
                     for cls in classes}
    batches = loader.Loader(dataset, batch_size, shuffle=False,
                            drop_last=False)
    for batch in batches:
        dis = dft.eval_step(state.pose_vars, state.refine_vars, batch,
                            state.w, state.posenet, state.refiner,
                            state.refine_start, state.cfg.iteration,
                            state.cfg.with_sym)
        for d, obj in zip(np.asarray(dis).tolist(),
                          np.asarray(batch["obj_idx"]).tolist()):
            cls = classes[int(obj)]
            results[cls]["dis"].append(d)
            key = "hit" if d < threshold_fn(int(obj)) else "miss"
            results[cls][key] += 1
    for cls, v in results.items():
        n = v["hit"] + v["miss"]
        v["success_rate"] = round(v["hit"] / n * 100, 2) if n else float("nan")
        v["dis"] = round(float(np.mean(v["dis"])), 5) if v["dis"] else float("nan")
    total_hit = sum(v["hit"] for v in results.values())
    total = sum(v["hit"] + v["miss"] for v in results.values())
    results["overall"] = {
        "success_rate": round(total_hit / max(total, 1) * 100, 2),
        "n": total,
    }
    return results


def eval_ycb(state: "dft.TrainerState", root: str, data_list: List[str],
             classes: List[str], batch_size: int = 8,
             out_path: Optional[str] = None,
             success_threshold: float = 0.02) -> Dict:
    """YCB: ADD(-S) < 2 cm success (upstream eval_ycb.py criterion)."""
    ds = legacy_datasets.YCBPoseDataset(
        root, data_list, classes, num_pt=state.cfg.num_points,
        num_pt_mesh=state.cfg.num_points_mesh)
    results = _run_eval(state, ds, classes, batch_size,
                        lambda obj: success_threshold)
    if out_path:
        io.write_json(out_path, results)
    return results


def eval_linemod(state: "dft.TrainerState", root: str, objects: List[int],
                 batch_size: int = 8, out_path: Optional[str] = None,
                 diameter_fraction: float = 0.1) -> Dict:
    """LineMOD: ADD < 10% of the object diameter (upstream eval_linemod.py)."""
    ds = legacy_datasets.LineModPoseDataset(
        root, objects, mode="test", num_pt=state.cfg.num_points,
        num_pt_mesh=state.cfg.num_points_mesh)
    diameters = {}
    for obj in objects:
        pts = ds.cld[obj]
        center = pts.mean(axis=0)
        diameters[obj - 1] = 2.0 * float(np.linalg.norm(pts - center,
                                                        axis=1).max())
    classes = [f"obj_{o:02d}" for o in objects]
    # obj_idx in samples is (obj - 1); map positions in `classes`
    idx_map = {o - 1: i for i, o in enumerate(objects)}

    results: Dict = {cls: {"dis": [], "hit": 0, "miss": 0}
                     for cls in classes}
    batches = loader.Loader(ds, batch_size, shuffle=False, drop_last=False)
    for batch in batches:
        dis = dft.eval_step(state.pose_vars, state.refine_vars, batch,
                            state.w, state.posenet, state.refiner,
                            state.refine_start, state.cfg.iteration,
                            state.cfg.with_sym)
        for d, obj in zip(np.asarray(dis).tolist(),
                          np.asarray(batch["obj_idx"]).tolist()):
            cls = classes[idx_map[int(obj)]]
            results[cls]["dis"].append(d)
            key = "hit" if d < diameter_fraction * diameters[int(obj)] \
                else "miss"
            results[cls][key] += 1
    for cls, v in results.items():
        n = v["hit"] + v["miss"]
        v["success_rate"] = round(v["hit"] / n * 100, 2) if n else float("nan")
        v["dis"] = round(float(np.mean(v["dis"])), 5) if v["dis"] else float("nan")
    if out_path:
        io.write_json(out_path, results)
    return results
