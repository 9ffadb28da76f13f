"""ADD(-S) evaluation over the test split.

Parity with /root/reference/experiments/eval.py:32-99: run the estimator +
`iteration` rebased refinement steps per sample, accumulate per-class mean
ADD(-S) distance and the <2 cm success rate, and the overall percentage.
Batched over the test loader; distances come from the same jitted eval step
the trainer uses.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable

import numpy as np

from ..train import densefusion as dft


def add_from_pose(quat, position, gt_rotation, gt_translation, model_points,
                  symmetric: bool = False) -> float:
    """ADD (or ADD-S when `symmetric`) between a predicted camera-frame pose
    (unit quaternion wxyz + translation, meters) and a ground-truth rotation
    matrix + translation, over `model_points` (M, 3) meters.

    The serving-side twin of the trainer's ADD(-S) distance
    (models/losses.pose_loss; reference /root/reference/DenseFusion/lib/
    loss.py:15-40): used where predictions arrive as quaternions from
    `pipeline.predict` instead of inside the jitted loss."""
    import jax.numpy as jnp

    from ..utils import transforms as T

    rot = np.asarray(T.quat_to_mat(jnp.asarray(quat, jnp.float32)))
    pred = model_points @ rot.T + np.asarray(position)
    gt = model_points @ np.asarray(gt_rotation).T + np.asarray(gt_translation)
    if symmetric:
        d = np.linalg.norm(pred[:, None, :] - gt[None, :, :], axis=-1)
        return float(d.min(axis=1).mean())
    return float(np.linalg.norm(pred - gt, axis=-1).mean())


def evaluate(state: "dft.TrainerState", test_batches: Callable[[], Iterable],
             classes, refine: bool = True, iteration: int = 2,
             success_threshold: float = 0.02) -> Dict:
    """Returns {cls: {'dis', '<2', '>=2', 'p'}, 'overall': {...}}."""
    results = {cls: {"dis": [], "t_err": [], "<2": 0, ">=2": 0}
               for cls in classes}
    for batch in test_batches():
        use_refine = refine and state.refine_vars is not None
        if "target_t" in batch:
            dis, quat, trans = dft.eval_step_full(
                state.pose_vars, state.refine_vars, batch, state.w,
                state.posenet, state.refiner, use_refine, iteration,
                state.cfg.with_sym)
            t_err = np.linalg.norm(
                np.asarray(trans) - np.asarray(batch["target_t"]), axis=1)
        else:
            dis = dft.eval_step(state.pose_vars, state.refine_vars, batch,
                                state.w, state.posenet, state.refiner,
                                use_refine, iteration, state.cfg.with_sym)
            t_err = np.full(len(np.asarray(batch["obj_idx"])), np.nan)
        dis = np.asarray(dis)
        for d, te, obj in zip(dis.tolist(), t_err.tolist(),
                              np.asarray(batch["obj_idx"]).tolist()):
            cls = classes[int(obj)]
            results[cls]["dis"].append(d)
            results[cls]["t_err"].append(te)
            results[cls]["<2" if d < success_threshold else ">=2"] += 1

    total_less = sum(v["<2"] for v in results.values())
    total_more = sum(v[">=2"] for v in results.values())
    for cls, v in results.items():
        n = v["<2"] + v[">=2"]
        v["p"] = round(v["<2"] / n * 100, 2) if n else float("nan")
        v["dis"] = round(float(np.mean(v["dis"])), 5) if v["dis"] else float("nan")
        with np.errstate(invalid="ignore"):
            v["t_err"] = (round(float(np.nanmean(v["t_err"])), 5)
                          if v["t_err"] and not np.all(np.isnan(v["t_err"]))
                          else float("nan"))
    results["overall"] = {
        "p": round(total_less / max(total_less + total_more, 1) * 100, 2),
        "n": total_less + total_more,
    }
    return results
