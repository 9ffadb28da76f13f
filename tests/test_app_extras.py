"""App visualise action, pose-yaml roundtrip, painted predictions,
stream-logs summary, seg image dumps."""
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoposeestimation_tpu import main as app_main
from autoposeestimation_tpu.hardware import hand_eye
from autoposeestimation_tpu.pipeline import predict
from autoposeestimation_tpu.utils import io, synthetic


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("appx"))
    synthetic.make_dataset(root, objects=[
        synthetic.SphereObject("ball", np.asarray([0.0, 0.0, 30.0]), 30.0,
                               (200, 0, 0))],
        cfg=synthetic.SynthConfig(n_viewpoints=3))
    return root


def test_app_visualise_action(synth_root):
    frames = []
    app = app_main.App(synth_root, input_fn=lambda _: "0",
                       print_fn=lambda _: None)
    n = app.visualise(kind="segmentation masks", obj="ball",
                      show=frames.append)
    assert n == 3 and len(frames) == 3
    n = app.visualise(kind="pose labels", obj="ball", show=frames.append)
    assert n == 3


def test_run_live_prediction_modes(tmp_path):
    """The TUI live loop (reference main.py:517-530) over a FakeDepthCam,
    in both the reference-style blocking mode and the beyond-reference
    pipelined mode (serve_stream with batched dispatch). FakeDepthCam
    yields uint16 depth, so this also drives the raw-dtype uplink path
    end-to-end through the App."""
    h, w = 96, 128
    rng = np.random.default_rng(0)
    cfg = synthetic.SynthConfig(img_h=h, img_w=w, fx=120.0, fy=120.0)
    from autoposeestimation_tpu.hardware import camera as cam_mod

    def cam_factory():
        return cam_mod.FakeDepthCam(cfg=cfg, spheres=[
            synthetic.SphereObject("obj", np.asarray([30.0, 10.0, 40.0]),
                                   40.0, (210, 50, 50))])

    models = predict.build_models(
        num_classes_fg=1, model_points=rng.normal(size=(1, 60, 3)) * 0.05,
        classes=("obj",), num_points=64, crop=32, refine_iters=1,
        dtype=jnp.float32, img_hw=(h, w))

    lines = []
    app = app_main.App(str(tmp_path), camera_factory=cam_factory,
                       input_fn=lambda _: "0", print_fn=lines.append)

    seen = []
    n = app.run_live_prediction(max_frames=2, models=models,
                                frame_callback=lambda fr, out: seen.append(
                                    (fr, out)))
    assert n == 2 and len(seen) == 2
    for fr, out in seen:
        assert fr["depth"].dtype == np.uint16
        assert set(out["predictions"]) <= {"obj"}
    assert len(lines) == 2 and all(l.startswith("fps:") for l in lines)

    lines.clear()
    seen.clear()
    n = app.run_live_prediction(max_frames=3, models=models, pipelined=True,
                                in_flight=2, batch=2,
                                frame_callback=lambda fr, out: seen.append(
                                    (fr, out)))
    assert n == 3 and len(seen) == 3 and len(lines) == 3
    for fr, out in seen:
        assert set(out["predictions"]) <= {"obj"}


def test_poses_yaml_roundtrip(tmp_path):
    poses = [np.eye(4), np.diag([1.0, 2, 3, 1])]
    path = str(tmp_path / "cam_poses.yaml")
    hand_eye.save_poses_yaml(path, poses)
    back = hand_eye.load_poses_yaml(path)
    assert len(back) == 2
    np.testing.assert_allclose(back[1], poses[1])


@pytest.mark.slow
def test_full_prediction_color_output():
    h, w = 96, 128
    rng = np.random.default_rng(0)
    models = predict.build_models(
        num_classes_fg=2, model_points=rng.normal(size=(2, 60, 3)) * 0.05,
        classes=("mug", "box"), num_points=64, crop=32, refine_iters=1,
        dtype=jnp.float32, img_hw=(h, w))
    image = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    depth = np.full((h, w), 800.0, np.float32)
    meta = {"intr": io.Intrinsics(width=w, height=h, ppx=w / 2, ppy=h / 2,
                                  fx=120.0, fy=120.0),
            "depth_scale": 0.001}
    out = predict.full_prediction(image, depth, meta, models,
                                  key=jax.random.PRNGKey(0),
                                  color_prediction=True, with_bbox=True)
    assert out["segmented_prediction"].shape == (h, w, 3)
    assert out["pose_prediction"].shape == (h, w, 3)
    assert out["segmented_prediction"].dtype == np.uint8


def test_stream_logs_once(tmp_path):
    path = str(tmp_path / "logs.json")
    with open(path, "w") as f:
        json.dump({"curves": {"loss": [1.0, 0.5], "iou": [0.2, 0.4]}}, f)
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "stream_logs.py"),
         path, "--once"],
        capture_output=True, text=True, timeout=60,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert "loss=0.5" in out.stdout


@pytest.mark.slow
def test_seg_training_image_dump(synth_root, tmp_path):
    from autoposeestimation_tpu.data import loader, segmentation_dataset
    from autoposeestimation_tpu.train import segmentation as seg

    # build a one-class segmentation dataset list for 'ball'
    from autoposeestimation_tpu.labeling import make_dataset

    make_dataset.make_train_and_test_dataset(synth_root, ["ball"],
                                             "segmentation", "dump",
                                             p_test=0.4, mode="gen")
    train_ds = segmentation_dataset.SegmentationDataset(
        synth_root, "dump", mode="train", label_mode="gen", output_size=64)
    valid_ds = segmentation_dataset.SegmentationDataset(
        synth_root, "dump", mode="test", label_mode="gen")
    cfg = seg.SegConfig(classes=2, epochs=1, batch_size=2, lr=1e-3)
    dump_dir = str(tmp_path / "images")
    seg.segmentation_training(
        lambda: loader.Loader(train_ds, 1, seed=0),
        lambda: loader.Loader(valid_ds, 1, shuffle=False, drop_last=False),
        cfg, out_dir=str(tmp_path), dtype=jnp.float32, sample_shape=(64, 64),
        image_dump_dir=dump_dir)
    assert os.path.exists(os.path.join(dump_dir, "epoch_0000.png"))
