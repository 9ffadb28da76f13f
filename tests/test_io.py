"""Round-trip tests for the on-disk dataset contract (utils/io.py)."""
import numpy as np

from autoposeestimation_tpu.utils import io


def test_meta_roundtrip(tmp_path):
    meta = {
        "joints": [0.1] * 6,
        "pose": {"x": 1.0, "y": 2.0, "z": 3.0, "a": 0.1, "b": 0.2, "c": 0.3},
        "object_pose": np.eye(4),
        "robot2endEff_tf": np.arange(16, dtype=np.float64).reshape(4, 4),
        "intr": io.Intrinsics(fx=615.0, fy=616.0, ppx=321.5, ppy=239.5),
        "depth_scale": 0.001,
        "symmetric": 0,
        "hand_eye_calibration": np.eye(4) * 2,
        "view_point_id": 7,
    }
    path = str(tmp_path / "000001.meta.json")
    io.write_sample_meta(path, meta)
    back = io.read_sample_meta(path)
    assert back["intr"].fx == 615.0
    np.testing.assert_allclose(back["robot2endEff_tf"], meta["robot2endEff_tf"])
    np.testing.assert_allclose(back["hand_eye_calibration"], np.eye(4) * 2)
    assert back["view_point_id"] == 7
    np.testing.assert_allclose(
        io.robot2cam_from_meta(back),
        meta["robot2endEff_tf"] @ (np.eye(4) * 2),
    )


def test_pose_label_meta_roundtrip(tmp_path):
    path = str(tmp_path / "000002.meta.json")
    io.write_pose_label_meta(
        path,
        position=[1.0, 2.0, 3.0],
        rotation=np.eye(3),
        cls_name="mug",
        cam2robot=np.eye(4),
        robot2object=np.diag([1.0, 2.0, 3.0, 1.0]),
    )
    back = io.read_pose_label_meta(path)
    assert back["cls_name"] == "mug"
    np.testing.assert_allclose(back["position"], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(back["rotation"], np.eye(3))


def test_png_roundtrip(tmp_path):
    rgb = np.random.default_rng(0).integers(0, 255, (48, 64, 3), dtype=np.uint8)
    depth = np.random.default_rng(1).integers(0, 4000, (48, 64)).astype(np.uint16)
    label = (np.random.default_rng(2).random((48, 64)) > 0.5).astype(np.uint8) * 255
    io.write_png(str(tmp_path / "a.color.png"), rgb)
    io.write_png(str(tmp_path / "a.depth.png"), depth)
    io.write_png(str(tmp_path / "a.gen.label.png"), label)
    np.testing.assert_array_equal(io.read_color(str(tmp_path / "a.color.png")), rgb)
    np.testing.assert_array_equal(io.read_depth(str(tmp_path / "a.depth.png")), depth)
    np.testing.assert_array_equal(io.read_label(str(tmp_path / "a.gen.label.png")), label)


def test_lines_roundtrip(tmp_path):
    lines = ["mug/foreground/000001", "mug/foreground/000002", "box/foreground/000001"]
    path = str(tmp_path / "train_data_list.txt")
    io.write_lines(path, lines)
    assert io.read_lines(path) == lines


def test_xyz_roundtrip(tmp_path):
    pts = np.random.default_rng(3).normal(size=(100, 3)) * 50
    path = str(tmp_path / "mug.xyz")
    io.write_xyz(path, pts)
    back = io.read_xyz(path)
    assert back.shape == (100, 3)
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_ply_pcd_roundtrip(tmp_path):
    pts = np.random.default_rng(4).normal(size=(77, 3)) * 10
    io.write_ply(str(tmp_path / "o.ply"), pts)
    io.write_pcd(str(tmp_path / "o.pcd"), pts)
    np.testing.assert_allclose(io.read_ply(str(tmp_path / "o.ply")), pts, atol=1e-8)
    np.testing.assert_allclose(io.read_pcd(str(tmp_path / "o.pcd")), pts, atol=1e-8)
