"""Multi-object end-to-end: two classes trained jointly, both detected by the
fused serving graph in a two-object scene."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoposeestimation_tpu.data import (loader, pose_dataset,
                                         segmentation_dataset)
from autoposeestimation_tpu.pipeline import predict
from autoposeestimation_tpu.train import densefusion as dft, segmentation as seg
from autoposeestimation_tpu.utils import io, synthetic

pytestmark = pytest.mark.slow

RED = np.asarray([55.0, 0.0, 45.0])
BLUE = np.asarray([-65.0, 25.0, 40.0])
R_RED, R_BLUE = 45.0, 40.0


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("multi"))
    synthetic.make_dataset(root, objects=[
        synthetic.SphereObject("red_ball", RED, R_RED, (210, 40, 40)),
        synthetic.SphereObject("blue_ball", BLUE, R_BLUE, (40, 60, 210)),
    ])
    return root


def test_multi_object_trained_serving(world):
    # --- train 3-class segmentation ---------------------------------------
    train_ds = segmentation_dataset.SegmentationDataset(
        world, "synth", mode="train", label_mode="gen", output_size=64)
    valid_ds = segmentation_dataset.SegmentationDataset(
        world, "synth", mode="test", label_mode="gen")
    cfg = seg.SegConfig(classes=3, epochs=10, batch_size=4, lr=3e-3)
    seg_out = seg.segmentation_training(
        lambda: loader.Loader(train_ds, 4, seed=0),
        lambda: loader.Loader(valid_ds, 4, shuffle=False, drop_last=False),
        cfg, out_dir=os.path.join(world, "segmentation", "trained_models",
                                  "synth"),
        dtype=jnp.float32, sample_shape=(64, 64))
    assert seg_out["best_iou"] > 0.4

    # --- train 2-object DenseFusion ---------------------------------------
    dcfg = dft.DFConfig(batch_size=4, num_points=100, num_points_mesh=120,
                        lr=1e-4, refine_epoch_margin=1000)
    state = dft.create_trainer(num_obj=2, cfg=dcfg, crop=64,
                               dtype=jnp.float32)
    ptrain = pose_dataset.PoseDataset(world, "synth", mode="train",
                                      num_pt=100, num_pt_mesh=120, crop=64,
                                      add_noise=False)
    ptest = pose_dataset.PoseDataset(world, "synth", mode="test", num_pt=100,
                                     num_pt_mesh=120, crop=64)
    state = dft.train(
        state,
        lambda: loader.Loader(ptrain, 4, seed=0),
        lambda: loader.Loader(ptest, 4, shuffle=False, drop_last=False),
        out_dir=os.path.join(world, "DenseFusion", "trained_models", "synth"),
        epochs=5)
    assert state.best_test < 0.1

    # --- serve a composite two-object frame -------------------------------
    classes = io.read_lines(os.path.join(
        io.dataset_dir(world, "segmentation", "synth"), "classes.txt"))
    max_m = 0
    clouds = []
    for cls in classes:
        pts = io.read_xyz(os.path.join(io.pc_dir(world), cls,
                                       f"{cls}.xyz")) / 1000.0
        clouds.append(pts)
        max_m = max(max_m, len(pts))
    model_points = np.zeros((2, max_m, 3), np.float32)
    for i, pts in enumerate(clouds):
        model_points[i] = pts[np.arange(max_m) % len(pts)]

    models = predict.build_models(
        num_classes_fg=2, model_points=model_points, classes=classes,
        seg_vars=seg_out["variables"], pose_vars=state.pose_vars,
        refine_vars=state.refine_vars, num_points=100, crop=64,
        refine_iters=0, dtype=jnp.float32, img_hw=(128, 160))

    # render both objects in one scene (training scenes were single-object)
    cfg_r = synthetic.SynthConfig()
    cam = synthetic.ring_cameras(cfg_r, np.zeros(3))[1]
    spheres = [
        synthetic.SphereObject("red_ball", RED, R_RED, (210, 40, 40)),
        synthetic.SphereObject("blue_ball", BLUE, R_BLUE, (40, 60, 210)),
    ]
    color, depth, _ = synthetic.render(cfg_r, cam, spheres)
    meta = {"intr": io.Intrinsics(width=cfg_r.img_w, height=cfg_r.img_h,
                                  ppx=cfg_r.img_w / 2, ppy=cfg_r.img_h / 2,
                                  fx=cfg_r.fx, fy=cfg_r.fy),
            "depth_scale": cfg_r.depth_scale}
    out = predict.full_prediction(color, depth.astype(np.float32), meta,
                                  models, key=jax.random.PRNGKey(0))

    found = set(out["predictions"].keys())
    assert found == {"red_ball", "blue_ball"}, found
    cam2robot = np.linalg.inv(cam)
    for cls, center in (("red_ball", RED), ("blue_ball", BLUE)):
        gt = (cam2robot @ np.append(center, 1.0))[:3] / 1000.0
        err = np.linalg.norm(out["predictions"][cls]["position"] - gt)
        assert err < 0.15, (cls, err)
