"""Datasets over the synthetic on-disk contract + loader mechanics."""
import os

import numpy as np
import pytest

from autoposeestimation_tpu.data import (bs_dataset, loader, pose_dataset,
                                         segmentation_dataset)
from autoposeestimation_tpu.utils import io, synthetic


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synthds"))
    synthetic.make_dataset(root)
    return root


def test_synthetic_layout(synth_root):
    assert io.list_objects(synth_root) == ["blue_ball", "red_ball"]
    ds = io.dataset_dir(synth_root, "pose_estimation", "synth")
    assert len(io.read_lines(os.path.join(ds, "classes.txt"))) == 2
    train = io.read_lines(os.path.join(ds, "train_data_list.txt"))
    test = io.read_lines(os.path.join(ds, "test_data_list.txt"))
    assert len(train) + len(test) == 24
    assert not set(train) & set(test)


def test_segmentation_dataset_test_mode(synth_root):
    ds = segmentation_dataset.SegmentationDataset(
        synth_root, "synth", mode="test")
    s = ds[0]
    assert s["image"].shape == (128, 160, 3)
    assert s["label"].shape == (128, 160)
    ids = np.unique(s["label"])
    assert ids[0] == 0 and len(ids) == 2 and ids[1] in (1, 2)


def test_segmentation_dataset_train_aug(synth_root):
    ds = segmentation_dataset.SegmentationDataset(
        synth_root, "synth", mode="train", output_size=96, seed=1)
    s = ds[0]
    assert s["image"].shape == (96, 96, 3)
    assert s["label"].shape == (96, 96)
    # the object should still be present after crop-and-zoom (label-driven)
    assert (s["label"] > 0).sum() > 20


def test_segmentation_dataset_computed_stats(synth_root):
    ds = segmentation_dataset.SegmentationDataset(
        synth_root, "synth", mode="test", use_imagenet_stats=False)
    assert ds.mean.shape == (3,) and np.all(ds.std > 0)


def test_pose_dataset_geometry(synth_root):
    ds = pose_dataset.PoseDataset(synth_root, "synth", mode="test",
                                  num_pt=200, num_pt_mesh=300, crop=64)
    s = ds[0]
    assert s["cloud"].shape == (200, 3)
    assert s["target"].shape == (300, 3)
    assert s["model_points"].shape == (300, 3)
    assert s["img"].shape == (64, 64, 3)
    # cloud points lie on the object surface: ||p - center|| == radius.
    # target = model @ R.T + t must coincide with the cloud's surface too.
    center = s["target"].mean(axis=0)
    d = np.linalg.norm(s["cloud"] - center, axis=1)
    radius = np.linalg.norm(s["model_points"], axis=1).mean()
    np.testing.assert_allclose(d.mean(), radius, rtol=0.05)


def test_pose_dataset_test_mode_deterministic(synth_root):
    """Test-mode point/model subsampling must be a pure function of the item
    index so every epoch's eval (and the post-training eval) scores the same
    draws — otherwise best-checkpoint selection is a min over noise."""
    ds = pose_dataset.PoseDataset(synth_root, "synth", mode="test",
                                  num_pt=50, num_pt_mesh=60, crop=64)
    a0, b0 = ds[0], ds[1]
    a1 = ds[0]  # re-read after consuming another item
    np.testing.assert_array_equal(a0["choose"], a1["choose"])
    np.testing.assert_array_equal(a0["model_points"], a1["model_points"])
    # different items draw differently
    assert not np.array_equal(a0["choose"], b0["choose"])
    # GT pose fields: target == model @ R.T + t
    np.testing.assert_allclose(
        a0["model_points"] @ a0["target_r"].T + a0["target_t"],
        a0["target"], atol=1e-5)


def test_pose_dataset_train_augmented(synth_root):
    ds = pose_dataset.PoseDataset(synth_root, "synth", mode="train",
                                  num_pt=150, num_pt_mesh=200, crop=64,
                                  add_noise=True, seed=3)
    s = ds[0]
    assert s is not None
    # noise_trans bound: cloud-to-target consistency within ~2*noise+radius tol
    center = s["target"].mean(axis=0)
    d = np.linalg.norm(s["cloud"] - center, axis=1)
    radius = np.linalg.norm(s["model_points"], axis=1).mean()
    assert abs(d.mean() - radius) < 0.08


def test_pose_dataset_viewpoint_subsampling(synth_root):
    full = pose_dataset.PoseDataset(synth_root, "synth", mode="train",
                                    crop=64, p_viewpoints=1.0)
    half = pose_dataset.PoseDataset(synth_root, "synth", mode="train",
                                    crop=64, p_viewpoints=0.5)
    assert len(half) < len(full)


def test_pose_dataset_symmetry_flags(synth_root):
    ds = pose_dataset.PoseDataset(synth_root, "synth", mode="test", crop=64)
    assert ds.get_sym_list() == [0, 1]  # spheres marked symmetric


def test_bs_dataset(synth_root):
    ds = bs_dataset.BSDataset(synth_root, mode="train", samples_per_class=5)
    assert len(ds) == 5  # one of two classes goes to test split
    s = ds[0]
    assert s["image"].shape == (128, 160, 7)
    assert set(np.unique(s["label"])) <= {0, 1}
    test = bs_dataset.BSDataset(synth_root, mode="test", samples_per_class=5)
    assert len(test) == 5
    train_objs = {o for o, _, _ in ds.samples}
    test_objs = {o for o, _, _ in test.samples}
    assert not train_objs & test_objs  # split by class


def test_loader_batching(synth_root):
    ds = segmentation_dataset.SegmentationDataset(synth_root, "synth",
                                                  mode="test")
    ld = loader.Loader(ds, batch_size=2, shuffle=True, seed=0)
    batches = list(ld)
    assert len(batches) == len(ds) // 2
    assert batches[0]["image"].shape == (2, 128, 160, 3)
    assert batches[0]["label"].shape == (2, 128, 160)


def test_device_prefetch(synth_root):
    ds = segmentation_dataset.SegmentationDataset(synth_root, "synth",
                                                  mode="test")
    ld = loader.Loader(ds, batch_size=2, shuffle=False)
    out = list(loader.device_prefetch(iter(ld)))
    assert len(out) == len(ld)
    assert hasattr(out[0]["image"], "devices")


def test_pose_dataset_meta_fields_pose_source(synth_root):
    """myDataset variant convention: the pose comes straight from the label
    meta's camera-frame position/rotation
    (/root/reference/DenseFusion/datasets/myDataset/dataset.py:168-169)
    instead of composing cam2robot @ robot2object. Our labeling pipeline
    writes position/rotation AS that composition, so on pipeline-produced
    data the two sources must agree exactly."""
    kw = dict(mode="test", num_pt=150, num_pt_mesh=200, crop=64,
              add_noise=False, seed=3)
    chain = pose_dataset.PoseDataset(synth_root, "synth",
                                     pose_source="tf_chain", **kw)
    fields = pose_dataset.PoseDataset(synth_root, "synth",
                                      pose_source="meta_fields", **kw)
    a, b = chain[0], fields[0]
    assert a is not None and b is not None
    np.testing.assert_allclose(a["target_r"], b["target_r"], atol=1e-9)
    np.testing.assert_allclose(a["target_t"], b["target_t"], atol=1e-9)
    np.testing.assert_allclose(a["target"], b["target"], atol=1e-9)


def test_pose_dataset_crop_and_zoom_variant(synth_root):
    """myDatasetAugmented2 behavior: zoomed crops with rewritten intrinsics
    must still backproject onto the object surface."""
    ds = pose_dataset.PoseDataset(synth_root, "synth", mode="train",
                                  num_pt=150, num_pt_mesh=200, crop=64,
                                  add_noise=False, crop_and_zoom=True, seed=5)
    s = ds[0]
    assert s is not None
    assert s["img"].shape == (64, 64, 3)
    center = s["target"].mean(axis=0)
    d = np.linalg.norm(s["cloud"] - center, axis=1)
    radius = np.linalg.norm(s["model_points"], axis=1).mean()
    assert abs(np.median(d) - radius) < 0.02, (np.median(d), radius)
