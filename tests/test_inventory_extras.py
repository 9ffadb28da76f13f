"""Final inventory items: line triangulation, surface positions, camera
intrinsics calibration (on generated ChArUco renders), GT persistence, and
the acquisition session with turns + resume."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from autoposeestimation_tpu import main as app_main
from autoposeestimation_tpu.acquisition import paths
from autoposeestimation_tpu.experiments import gt_test
from autoposeestimation_tpu.hardware import camera as cam, hand_eye, robot
from autoposeestimation_tpu.ops import pointcloud as pc
from autoposeestimation_tpu.reconstruction import create_pointcloud as rec
from autoposeestimation_tpu.utils import io, synthetic


def test_intersect_line_line():
    p1 = jnp.asarray([0.0, 0.0, 0.0])
    d1 = jnp.asarray([1.0, 0.0, 0.0])
    p2 = jnp.asarray([0.0, 1.0, 5.0])
    d2 = jnp.asarray([0.0, 0.0, 1.0])
    a, b = pc.intersect_line_line(p1, d1, p2, d2)
    np.testing.assert_allclose(np.asarray(a), [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(b), [0, 1, 0], atol=1e-6)


def test_triangulate_position():
    target = np.asarray([1.0, 2.0, 3.0])
    rng = np.random.default_rng(0)
    origins = rng.normal(size=(6, 3)) * 5
    directions = target - origins  # exact rays through the target
    got = np.asarray(pc.triangulate_position(jnp.asarray(origins, jnp.float32),
                                             jnp.asarray(directions,
                                                         jnp.float32)))
    np.testing.assert_allclose(got, target, atol=1e-4)


@pytest.mark.slow
def test_get_surface_positions(tmp_path):
    root = str(tmp_path)
    center = np.asarray([20.0, -5.0, 30.0])
    synthetic.make_dataset(root, objects=[
        synthetic.SphereObject("ball", center, 30.0, (200, 0, 0))],
        cfg=synthetic.SynthConfig(n_viewpoints=4))
    pos = rec.get_surface_positions(root, "ball", "foreground",
                                    min_friends=3, min_dist=10,
                                    nb_neighbors=5, mode="gen", voxel_size=4)
    assert pos.shape == (4, 2, 3)
    # triangulate the object from (camera -> surface centroid) rays
    origins = jnp.asarray(pos[:, 1], jnp.float32)
    directions = jnp.asarray(pos[:, 0] - pos[:, 1], jnp.float32)
    got = np.asarray(pc.triangulate_position(origins, directions))
    np.testing.assert_allclose(got[:2], center[:2], atol=15.0)


def test_calibrate_camera_intrinsics_on_rendered_board():
    cv2 = pytest.importorskip("cv2")

    board, _ = hand_eye.get_board()
    base = board.generateImage((640, 480), marginSize=40)
    images = []
    # several warped views of the board
    rng = np.random.default_rng(0)
    for _ in range(6):
        src = np.float32([[0, 0], [640, 0], [640, 480], [0, 480]])
        jitter = rng.uniform(-40, 40, (4, 2)).astype(np.float32)
        m = cv2.getPerspectiveTransform(src, src + jitter)
        images.append(cv2.warpPerspective(base, m, (640, 480),
                                          borderValue=255))
    out = hand_eye.calibrate_camera_intrinsics(images)
    assert out is not None
    assert out["intr"].fx > 0 and out["rms"] < 5.0


def test_gt_selection_persistence(tmp_path):
    root = str(tmp_path)
    synthetic.make_dataset(root, objects=[
        synthetic.SphereObject("ball", np.asarray([0.0, 0.0, 30.0]), 30.0,
                               (200, 0, 0))],
        cfg=synthetic.SynthConfig(n_viewpoints=5))
    first = gt_test.select_samples_for_gt_test(root, ["ball"], p=0.4,
                                               seed=1, persist=True)
    # different seed must return the persisted selection, not a new draw
    second = gt_test.select_samples_for_gt_test(root, ["ball"], p=0.4,
                                                seed=99, persist=True)
    assert first == second
    meta = io.read_sample_meta(os.path.join(
        io.data_dir(root), "ball", first[0].split("/", 1)[1] + ".meta.json"))
    assert meta["gt_test_sample"] is True


@pytest.mark.slow
def test_acquisition_session_with_turns_and_resume(tmp_path):
    root = str(tmp_path)
    cfg = synthetic.SynthConfig(n_viewpoints=3)
    cams = synthetic.ring_cameras(cfg, np.zeros(3))
    fr = robot.FakeRobot(fk_fn=robot.ring_fk(cams))
    fc = cam.FakeDepthCam(cfg=cfg, robot2cam_fn=lambda: fr.robot2end())
    app = app_main.App(root, camera_factory=lambda: fc,
                       controller_factory=lambda: fr,
                       print_fn=lambda _: None)
    path = paths.generate_ring_path(3)
    n = app.acquire_new_data_from_object("obj", path_data=path,
                                         with_turns=True)
    assert n == 3 * len(app_main.App.DEFAULT_RUNS)
    runs = io.list_runs(root, "obj")
    assert "foreground180" in runs and "foreground90_3" in runs
    meta = io.read_sample_meta(os.path.join(
        io.data_dir(root), "obj", "foreground180", "000000.meta.json"))
    # the declared 180-deg turn is recorded in object_pose's rotation
    assert not np.allclose(np.asarray(meta["object_pose"])[:3, :3], np.eye(3))

    # resume: only runs from continue_at onward execute
    root2 = str(tmp_path / "resume")
    app2 = app_main.App(root2, camera_factory=lambda: fc,
                        controller_factory=lambda: fr,
                        print_fn=lambda _: None)
    n2 = app2.acquire_new_data_from_object(
        "obj", path_data=path, with_turns=True, continue_at="foreground90")
    assert n2 == 3 * 3
    assert "background" not in io.list_runs(root2, "obj")
