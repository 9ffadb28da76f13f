"""Experiments layer: ADD eval, gt_test, sweeps, batched serving mode."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoposeestimation_tpu.data import loader, pose_dataset
from autoposeestimation_tpu.experiments import eval as eval_mod
from autoposeestimation_tpu.experiments import gt_test, sweeps
from autoposeestimation_tpu.train import densefusion as dft
from autoposeestimation_tpu.utils import io, synthetic


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("expx"))
    synthetic.make_dataset(root)
    return root


@pytest.fixture(scope="module")
def trained(synth_root):
    cfg = dft.DFConfig(batch_size=2, num_points=80, num_points_mesh=100,
                       lr=1e-4)
    state = dft.create_trainer(num_obj=2, cfg=cfg, crop=64, dtype=jnp.float32)
    return state, cfg


@pytest.mark.slow
def test_evaluate_structure(synth_root, trained):
    state, cfg = trained
    classes = io.read_lines(os.path.join(
        io.dataset_dir(synth_root, "pose_estimation", "synth"),
        "classes.txt"))
    test_ds = pose_dataset.PoseDataset(
        synth_root, "synth", mode="test", num_pt=cfg.num_points,
        num_pt_mesh=cfg.num_points_mesh, crop=64)
    results = eval_mod.evaluate(
        state, lambda: loader.Loader(test_ds, 2, shuffle=False,
                                     drop_last=False),
        classes, refine=False)
    assert "overall" in results
    assert results["overall"]["n"] > 0
    for cls in classes:
        assert set(results[cls]).issuperset({"dis", "<2", ">=2", "p"})


def test_gt_test_metrics(synth_root):
    # gen labels identical to GT pred labels -> perfect scores
    samples = gt_test.select_samples_for_gt_test(synth_root,
                                                 ["red_ball"], p=0.5)
    assert samples
    out = gt_test.gt_test(synth_root, ["red_ball"], modes=("gen",),
                          gt_mode="pred", samples=samples)
    assert out["gen"]["n"] == len(samples)
    assert out["gen"]["iou"] == pytest.approx(1.0)
    assert out["gen"]["iou>=0.5"] == 1.0


def test_compute_metrics_values():
    pred = np.zeros((10, 10), np.uint8)
    gt = np.zeros((10, 10), np.uint8)
    pred[0:5, 0:10] = 255   # 50 px
    gt[0:10, 0:5] = 255     # 50 px, overlap 25
    m = gt_test.compute_metrics(pred, gt)
    assert m["iou"] == pytest.approx(25 / 75)
    assert m["precision"] == pytest.approx(0.5)
    assert m["recall"] == pytest.approx(0.5)


@pytest.mark.slow
def test_sweep_and_eval_exp(synth_root, tmp_path):
    cfg = dft.DFConfig(batch_size=2, num_points=60, num_points_mesh=80,
                       lr=1e-4, nepoch=2)
    out_base = str(tmp_path / "runs")
    stats = sweeps.train_pose_estimation_exp(
        synth_root, "synth", p_viewpoints_grid=(1.0,), epochs=2, cfg=cfg,
        out_base=out_base)
    assert len(stats["runs"]) == 1
    assert os.path.exists(os.path.join(out_base, "sweep_stats.json"))

    results = sweeps.eval_exp(synth_root, "synth", runs_dir=out_base,
                              cfg=cfg)
    assert len(results) == 1
    run = next(iter(results.values()))
    assert "overall" in run

    best = sweeps.plot_pose_exp_results(out_base)
    assert len(best) == 1
    r = next(iter(best.values()))
    assert r["n_epochs"] == 1 or r["n_epochs"] >= 1


@pytest.mark.slow
def test_batched_full_prediction(synth_root):
    from autoposeestimation_tpu.pipeline import predict

    h, w = 96, 128
    rng = np.random.default_rng(0)
    models = predict.build_models(
        num_classes_fg=2, model_points=rng.normal(size=(2, 40, 3)) * 0.05,
        classes=("a", "b"), num_points=32, crop=32, refine_iters=1,
        dtype=jnp.float32, img_hw=(h, w))
    static = predict.static_tuple(models)
    images = jnp.asarray(rng.integers(0, 255, (3, h, w, 3)), jnp.uint8)
    depths = jnp.full((3, h, w), 700.0, jnp.float32)
    intr = jnp.asarray([120.0, 120.0, w / 2, h / 2], jnp.float32)
    out = predict._full_prediction_batched_jit(
        models.seg_vars, models.pose_vars, models.refine_vars, images,
        depths, intr, jnp.float32(0.001), jax.random.PRNGKey(0), static)
    assert out["quats"].shape == (3, 2, 4)
    assert out["positions"].shape == (3, 2, 3)
    assert out["masks"].shape == (3, 2, h, w)


@pytest.mark.parametrize("artifact", ["demo_results_round3.json",
                                      "demo_results_round3_fullrun.json",
                                      "demo_results_round3_headrun.json"])
def test_demo_round3_operating_regime(artifact):
    """Regression pin on the round-3 demo artifacts (r2 VERDICT task 3): in
    the reference's operating regime the trained refiner must improve BOTH
    ADD and translation error, serving must run with refine enabled, and
    overall ADD<2cm success must be >= 90%
    (/root/reference/experiments/eval.py:80-99 semantics). The `headrun`
    artifact (one uninterrupted run at round-3 HEAD) additionally pins that
    BOTH the lr/w decay and the refine-phase switch fired BY MARGIN
    (train.py:41-42 margins reached, not the epoch/schedule fallback).
    Skips artifacts not produced in this checkout."""
    import json

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", artifact)
    if not os.path.exists(path):
        pytest.skip(f"{artifact} not present")
    with open(path) as f:
        res = json.load(f)
    ev = res["eval"]
    est = ev["estimator_only"]["ball"]
    ref = ev["with_refine"]["ball"]
    assert ref["dis"] <= est["dis"], (ref["dis"], est["dis"])
    assert ref["t_err"] <= est["t_err"], (ref["t_err"], est["t_err"])
    assert ev["use_refine"] is True
    # `p` is a percentage (experiments/eval.py `p = 100 * <2cm / n`)
    assert ref["p"] >= 90.0, ref["p"]
    if artifact.endswith("headrun.json"):
        tr = res["pose_training"]["transitions"]
        assert tr["decay"]["trigger"] == "margin", tr
        assert tr["refine"]["trigger"] == "margin", tr
