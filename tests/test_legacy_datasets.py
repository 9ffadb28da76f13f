"""Legacy YCB/LineMOD loaders on miniature synthetic trees in the real layouts."""
import os

import numpy as np
import pytest

from autoposeestimation_tpu.data import legacy_datasets as legacy
from autoposeestimation_tpu.utils import io
from PIL import Image


@pytest.fixture(scope="module")
def ycb_root(tmp_path_factory):
    import scipy.io as scio

    root = str(tmp_path_factory.mktemp("ycb"))
    h, w = 96, 128
    os.makedirs(os.path.join(root, "data", "0001"), exist_ok=True)
    os.makedirs(os.path.join(root, "models", "002_master_chef_can"),
                exist_ok=True)
    rng = np.random.default_rng(0)
    model = rng.normal(size=(200, 3)) * 0.04
    with open(os.path.join(root, "models", "002_master_chef_can",
                           "points.xyz"), "w") as f:
        for p in model:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")

    pose = np.eye(3)
    t = np.asarray([0.0, 0.0, 0.9])
    fx, fy, ppx, ppy = legacy.YCBPoseDataset.CAM_1
    depth = np.zeros((h, w), np.uint16)
    label = np.zeros((h, w), np.uint8)
    depth[30:60, 40:80] = 9000  # 0.9 m at factor 10000
    label[30:60, 40:80] = 1
    img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    base = os.path.join(root, "data", "0001", "000001")
    Image.fromarray(img).save(base + "-color.png")
    Image.fromarray(depth).save(base + "-depth.png")
    Image.fromarray(label).save(base + "-label.png")
    scio.savemat(base + "-meta.mat", {
        "cls_indexes": np.asarray([[1]]),
        "poses": np.concatenate([pose, t[:, None]], axis=1)[:, :, None],
        "factor_depth": np.asarray([[10000.0]]),
    })
    return root


def test_ycb_dataset(ycb_root):
    ds = legacy.YCBPoseDataset(ycb_root, ["data/0001/000001"],
                               ["002_master_chef_can"], num_pt=100,
                               num_pt_mesh=150, crop=64)
    s = ds[0]
    assert s is not None
    assert s["cloud"].shape == (100, 3)
    assert s["model_points"].shape == (150, 3)
    assert s["img"].shape == (64, 64, 3)
    np.testing.assert_allclose(s["cloud"][:, 2], 0.9, atol=1e-3)
    assert int(s["obj_idx"]) == 0


@pytest.fixture(scope="module")
def linemod_root(tmp_path_factory):
    import yaml

    root = str(tmp_path_factory.mktemp("linemod"))
    seq = os.path.join(root, "data", "01")
    for sub in ("rgb", "depth", "mask"):
        os.makedirs(os.path.join(seq, sub), exist_ok=True)
    os.makedirs(os.path.join(root, "models"), exist_ok=True)
    rng = np.random.default_rng(1)
    model_mm = rng.normal(size=(150, 3)) * 30
    io.write_ply(os.path.join(root, "models", "obj_01.ply"), model_mm)
    h, w = 96, 128
    img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    depth = np.zeros((h, w), np.uint16)
    mask = np.zeros((h, w), np.uint8)
    depth[20:50, 30:70] = 800  # 0.8 m at factor 1000
    mask[20:50, 30:70] = 255
    Image.fromarray(img).save(os.path.join(seq, "rgb", "0000.png"))
    Image.fromarray(depth).save(os.path.join(seq, "depth", "0000.png"))
    Image.fromarray(mask).save(os.path.join(seq, "mask", "0000.png"))
    gt = {0: [{"obj_id": 1,
               "cam_R_m2c": np.eye(3).flatten().tolist(),
               "cam_t_m2c": [10.0, -5.0, 820.0]}]}
    with open(os.path.join(seq, "gt.yml"), "w") as f:
        yaml.safe_dump(gt, f)
    with open(os.path.join(seq, "train.txt"), "w") as f:
        f.write("0000\n")
    with open(os.path.join(seq, "test.txt"), "w") as f:
        f.write("0000\n")
    return root


def test_linemod_dataset(linemod_root):
    ds = legacy.LineModPoseDataset(linemod_root, [1], mode="train",
                                   num_pt=80, num_pt_mesh=100, crop=64)
    assert len(ds) == 1
    s = ds[0]
    assert s is not None
    assert s["cloud"].shape == (80, 3)
    np.testing.assert_allclose(s["cloud"][:, 2], 0.8, atol=1e-3)
    # target centered near gt translation (m)
    np.testing.assert_allclose(s["target"].mean(0), [0.01, -0.005, 0.82],
                               atol=0.02)


@pytest.mark.slow
def test_eval_linemod_driver(linemod_root):
    import jax.numpy as jnp

    from autoposeestimation_tpu.experiments import legacy_eval
    from autoposeestimation_tpu.train import densefusion as dft

    cfg = dft.DFConfig(num_points=80, num_points_mesh=100, batch_size=1)
    state = dft.create_trainer(num_obj=1, cfg=cfg, crop=64, dtype=jnp.float32)
    out = legacy_eval.eval_linemod(state, linemod_root, [1], batch_size=1)
    assert "obj_01" in out
    assert out["obj_01"]["hit"] + out["obj_01"]["miss"] == 1


def test_ycb_seg_dataset(ycb_root):
    """vanilla_segmentation SegDataset parity: real frame, noisy frame, and
    the synthetic background-compositing branch."""
    # add a synthetic frame whose background must get composited from a real one
    base_syn = os.path.join(ycb_root, "data_syn")
    os.makedirs(base_syn, exist_ok=True)
    rng = np.random.default_rng(1)
    h, w = 96, 128
    img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    label = np.zeros((h, w), np.uint8)
    label[10:40, 10:50] = 1
    Image.fromarray(img).save(os.path.join(base_syn, "000001-color.png"))
    Image.fromarray(label).save(os.path.join(base_syn, "000001-label.png"))

    ds = legacy.YCBSegDataset(ycb_root, ["data/0001/000001"], use_noise=False,
                              length=3)
    s = ds[0]
    assert s["image"].shape == (h, w, 3) and s["image"].dtype == np.float32
    assert s["label"].shape == (h, w) and s["label"].dtype == np.int32
    assert set(np.unique(s["label"])) <= {0, 1}

    ds_syn = legacy.YCBSegDataset(
        ycb_root, ["data_syn/000001", "data/0001/000001"] * 6,
        use_noise=True, length=4, seed=3)
    got_syn = False
    for i in range(4):
        s = ds_syn[i]
        assert np.isfinite(s["image"]).all()
    # force the syn branch directly
    ds_syn.rng.randint = lambda a, b: 0  # always pick index 0 = data_syn
    s = ds_syn[0]
    assert s["label"].max() >= 1
    got_syn = True
    assert got_syn
