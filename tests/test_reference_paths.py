"""The reference's SHIPPED robot-path artifacts as consumed inputs.

`acquisition/paths.py` claims schema parity with the reference's recorded
paths (/root/reference/robot_controller/robot_path/*.json). These tests prove
it: load the actual shipped files (162-target viewpointsPath.json with via
flags as *strings*, 27-target handEyeCalibPath.json), drive the acquisition
scan loop and the hand-eye collection off them with FakeRobot/FakeDepthCam,
and assert the emitted meta.json schema — the same consumption the reference
performs in /root/reference/data_generation/getData.py:104-115,128-184 and
/root/reference/hand_eye_calibration/getPoses.py:12-129.
"""
import os

import numpy as np
import pytest

from autoposeestimation_tpu.acquisition import get_data as gd
from autoposeestimation_tpu.acquisition import paths
from autoposeestimation_tpu.hardware import camera as cam
from autoposeestimation_tpu.hardware import hand_eye, robot
from autoposeestimation_tpu.utils import io, synthetic, transforms as T
import jax.numpy as jnp

REF_PATH_DIR = "/root/reference/robot_controller/robot_path"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_PATH_DIR), reason="reference tree not present")


def test_shipped_path_files_parse_with_same_schema():
    """Every shipped path file loads through our loader and carries the
    {'joints', 'via_points', 'cart_pose'} schema paths.py claims."""
    files = sorted(os.listdir(REF_PATH_DIR))
    assert "viewpointsPath.json" in files
    assert "handEyeCalibPath.json" in files
    for name in files:
        data = paths.load_path(os.path.join(REF_PATH_DIR, name))
        assert set(data.keys()) >= {"joints", "via_points", "cart_pose"}
        n = len(data["joints"])
        assert n == len(data["via_points"]) > 0
        j = np.asarray(data["joints"], float)
        assert j.shape == (n, 6)  # 6-DoF joint targets, degrees
        # via flags are "0"/"1" strings in the shipped files; the scan loop
        # consumes them via int() (getData.py:143 does the same)
        assert {int(v) for v in data["via_points"]} <= {0, 1}
        for pose in data["cart_pose"]:
            assert set(pose.keys()) == {"x", "y", "z", "a", "b", "c"}


def _sphere_fk(joints_deg):
    """Deterministic FK for arbitrary 6-joint targets: camera on a sphere
    parametrized by the first two joints, always facing the table center."""
    az = np.deg2rad(float(joints_deg[0]))
    el = np.deg2rad(np.clip(float(joints_deg[1]) + 90.0, -55.0, 55.0))
    pos = np.asarray([420.0 * np.cos(az) * np.cos(el),
                      420.0 * np.sin(az) * np.cos(el),
                      380.0 + 120.0 * np.sin(el)])
    return synthetic.look_at(pos, np.zeros(3))


def test_scan_loop_consumes_shipped_viewpoints_path(tmp_path):
    """getData off the real viewpointsPath.json: 162 targets, 5 via points →
    157 captured samples with the reference meta.json schema."""
    data = gd.load_robot_path(os.path.join(REF_PATH_DIR,
                                           "viewpointsPath.json"))
    assert len(data["joints"]) == 162
    n_capture = sum(1 for v in data["via_points"] if int(v) == 0)

    cfg = synthetic.SynthConfig(img_h=48, img_w=64, fx=56.0, fy=56.0)
    fr = robot.FakeRobot(fk_fn=_sphere_fk)
    fc = cam.FakeDepthCam(cfg=cfg, robot2cam_fn=lambda: fr.robot2end())

    root = str(tmp_path)
    n = gd.get_data(fc, fr, data, root, "obj", "foreground",
                    {"a": 0.0, "b": 0.0, "c": 0.0}, symmetric=0,
                    hand_eye_calibration=np.eye(4), settle=0.0,
                    with_extra=False, motion_poll=0.0)
    assert n == n_capture == 157

    run_dir = os.path.join(io.data_dir(root), "obj", "foreground")
    ids = io.list_sample_ids(run_dir)
    assert len(ids) == n_capture and ids[0] == "000000"
    meta = io.read_sample_meta(os.path.join(run_dir, "000000.meta.json"))
    assert meta["view_point_id"] == 0
    assert meta["symmetric"] == 0
    assert meta["intr"].width == cfg.img_w
    assert np.asarray(meta["robot2endEff_tf"]).shape == (4, 4)
    # sample 000000 is the first non-via target; hand_eye=I so robot2endEff
    # reproduces the FK camera pose at that target
    first_capture = next(i for i, v in enumerate(data["via_points"])
                         if int(v) == 0)
    np.testing.assert_allclose(
        meta["robot2endEff_tf"],
        _sphere_fk(data["joints"][first_capture]), atol=1e-3)


def test_hand_eye_collection_consumes_shipped_calib_path(tmp_path):
    """collect_and_calibrate off the real handEyeCalibPath.json's 27 joint
    targets (getPoses.py flow), recovering a known end2cam X."""
    cv2 = pytest.importorskip("cv2")
    data = gd.load_robot_path(os.path.join(REF_PATH_DIR,
                                           "handEyeCalibPath.json"))
    targets_deg = np.asarray(data["joints"], float)
    assert targets_deg.shape == (27, 6)

    board, _ = hand_eye.get_board()
    base = board.generateImage((800, 920), marginSize=40)
    det = cv2.aruco.CharucoDetector(board)
    corners, ids, _, _ = det.detectBoard(base)
    obj_pts, img_pts = board.matchImagePoints(corners, ids)
    h_base, _ = cv2.findHomography(obj_pts.reshape(-1, 3)[:, :2],
                                   img_pts.reshape(-1, 2))

    intr = io.Intrinsics(width=640, height=480, ppx=320.0, ppy=240.0,
                         fx=600.0, fy=600.0, coeffs=[0.0] * 5)
    k_mat = np.asarray([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1]])

    true_x = np.eye(4)  # end2cam (mm)
    true_x[:3, :3] = np.asarray(T.euler_to_mat(
        jnp.float32(0.06), jnp.float32(-0.1), jnp.float32(0.15)))
    true_x[:3, 3] = [30.0, -40.0, 50.0]
    board_in_robot = np.eye(4)
    board_in_robot[:3, 3] = [300.0, 100.0, 10.0]

    # one board-facing end pose per shipped joint target
    rng = np.random.default_rng(4)
    cam2board_list = []
    for _ in range(len(targets_deg)):
        c = np.eye(4)
        c[:3, :3] = np.asarray(T.euler_to_mat(
            jnp.float32(rng.uniform(-0.45, 0.45)),
            jnp.float32(rng.uniform(-0.45, 0.45)),
            jnp.float32(rng.uniform(-0.6, 0.6))))
        c[:3, 3] = [rng.uniform(-60, 10), rng.uniform(-60, 10),
                    rng.uniform(240, 380)]
        cam2board_list.append(c)
    ends = [board_in_robot @ np.linalg.inv(c) @ np.linalg.inv(true_x)
            for c in cam2board_list]

    def fk(joints_deg):
        idx = int(np.argmin(
            np.linalg.norm(targets_deg - np.asarray(joints_deg), axis=1)))
        return ends[idx]

    ctrl = robot.FakeRobot(fk_fn=fk)

    class BoardCam(cam.DepthCamBase):
        def get_intrinsics(self):
            return intr

        def get_frames(self, with_repair=False, secure_image=False):
            e = ctrl.robot2end()
            c2b = np.linalg.inv(e @ true_x) @ board_in_robot
            h_view = k_mat @ np.column_stack(
                [c2b[:3, 0], c2b[:3, 1], c2b[:3, 3]])
            m = h_view @ np.linalg.inv(h_base)
            img = cv2.warpPerspective(base, m / m[2, 2], (640, 480),
                                      borderValue=255)
            return {"image": np.stack([img] * 3, axis=-1),
                    "depth": np.zeros((480, 640), np.uint16)}

    out_path = os.path.join(str(tmp_path), "handEye_tf.json")
    rad_targets = [np.deg2rad(t) for t in targets_deg]
    out = hand_eye.collect_and_calibrate(BoardCam(), ctrl, rad_targets,
                                         out_path=out_path)
    assert out["n_stations"] == 27
    got = hand_eye.load_hand_eye(out_path)
    rel = got[:3, :3].T @ true_x[:3, :3]
    ang = np.degrees(np.arccos(np.clip((np.trace(rel) - 1) / 2, -1, 1)))
    assert ang < 0.5
    np.testing.assert_allclose(got[:3, 3], true_x[:3, 3], atol=3.0)
