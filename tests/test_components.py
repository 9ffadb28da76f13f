"""Tests for the remaining component surface: visualization, paths,
maintenance scripts, seg model variants, SegNet, sweeps, config."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoposeestimation_tpu import config as cfg_mod
from autoposeestimation_tpu.acquisition import maintenance, paths
from autoposeestimation_tpu.models import segnet, seg_variants
from autoposeestimation_tpu.pipeline import visualize as viz
from autoposeestimation_tpu.utils import io, synthetic


def test_pointcloud2image_splat():
    img = np.zeros((40, 60, 3), np.uint8)
    intr = io.Intrinsics(width=60, height=40, ppx=30, ppy=20, fx=50, fy=50)
    pts = np.asarray([[0.0, 0.0, 100.0]])  # projects to center
    out = viz.pointcloud2image(img, pts, 3, intr, color=(255, 0, 0))
    assert out[20, 30, 0] == int(255 * 0.3)
    assert out[10, 10, 0] == 0
    # out-of-frame point is skipped, not an error
    out2 = viz.pointcloud2image(img, np.asarray([[1000.0, 0, 10.0]]), 3, intr)
    assert (out2 == 0).all()


def test_overlay_and_bbox():
    img = np.full((20, 20, 3), 100, np.uint8)
    mask = np.zeros((20, 20), np.uint8)
    mask[5:10, 5:10] = 255
    out = viz.overlay_mask(img, mask, (255, 0, 0))
    assert out[7, 7, 0] == int(100 * 0.7 + 255 * 0.3)
    assert out[0, 0, 0] == 100
    boxed = viz.draw_bbox(img, (2, 18, 2, 18), (0, 255, 0))
    assert (boxed[2, 2:18] == [0, 255, 0]).all()


def test_cancellation_token():
    tok = viz.CancellationToken()
    assert not tok.cancelled
    tok.listen(input_fn=lambda _: "")
    import time

    time.sleep(0.05)
    assert tok.cancelled


def test_visualise_generators(tmp_path):
    root = str(tmp_path)
    synthetic.make_dataset(root, objects=[
        synthetic.SphereObject("ball", np.asarray([0.0, 0.0, 30.0]), 30.0,
                               (200, 0, 0))],
        cfg=synthetic.SynthConfig(n_viewpoints=3))
    frames = list(viz.visualise_segmentation_masks(root, "ball", "foreground",
                                                   mode="gen"))
    assert len(frames) == 3
    pose_frames = list(viz.visualise_pose_labels(root, "ball", "foreground"))
    assert len(pose_frames) == 3
    assert pose_frames[0].dtype == np.uint8


def test_path_generator_and_roundtrip(tmp_path):
    p = paths.generate_ring_path(4, n_via=1)
    assert len(p["joints"]) == 8
    assert sum(1 for v in p["via_points"] if v == 0) == 4
    fp = str(tmp_path / "path.json")
    paths.save_path(fp, p)
    assert paths.load_path(fp)["joints"] == p["joints"]


def test_record_path():
    class FakeCtl:
        def get_joints(self, t="deg"):
            return [1.0] * 6

        def get_pose(self, return_mm=True):
            return {"x": 0, "y": 0, "z": 0, "a": 0, "b": 0, "c": 0}

    answers = iter(["c", "v", "x", "d"])
    p = paths.record_path(FakeCtl(), input_fn=lambda _: next(answers),
                          print_fn=lambda _: None)
    assert p["via_points"] == [0, 1]


def test_fix_symmetric(tmp_path):
    root = str(tmp_path)
    synthetic.make_dataset(root, objects=[
        synthetic.SphereObject("ball", np.asarray([0.0, 0.0, 30.0]), 30.0,
                               (200, 0, 0), symmetric=1)],
        cfg=synthetic.SynthConfig(n_viewpoints=2))
    n = maintenance.fix_symmetric(root, "ball", symmetric=0)
    assert n == 4  # 2 background + 2 foreground
    meta = io.read_sample_meta(os.path.join(
        io.data_dir(root), "ball", "foreground", "000000.meta.json"))
    assert meta["symmetric"] == 0


def test_clean_extra_data(tmp_path):
    root = str(tmp_path)
    synthetic.make_dataset(root, objects=[
        synthetic.SphereObject("ball", np.asarray([0.0, 0.0, 30.0]), 30.0,
                               (200, 0, 0))],
        cfg=synthetic.SynthConfig(n_viewpoints=2))
    # two runs with different declared rotations
    fg_dir = os.path.join(io.data_dir(root), "ball", "foreground")
    extra_dir = os.path.join(io.data_dir(root), "ball", "extra")
    os.makedirs(extra_dir, exist_ok=True)
    meta = io.read_sample_meta(os.path.join(fg_dir, "000000.meta.json"))
    img = io.read_color(os.path.join(fg_dir, "000000.color.png"))
    depth = io.read_depth(os.path.join(fg_dir, "000000.depth.png"))
    # matching extra sample (rotation == identity like the run)
    for t, ok in (("100.5", True), ("200.5", False)):
        m = dict(meta)
        if not ok:
            bad = np.eye(4)
            bad[:3, :3] = [[0, -1, 0], [1, 0, 0], [0, 0, 1]]
            m["object_pose"] = bad
        io.write_png(os.path.join(extra_dir, t + ".color.png"), img)
        io.write_png(os.path.join(extra_dir, t + ".depth.png"), depth)
        io.write_sample_meta(os.path.join(extra_dir, t + ".meta.json"), m)
    out = maintenance.clean_extra_data(root, "ball")
    assert out["kept"] == 1 and out["deleted"] == 1


@pytest.mark.parametrize("cls", [seg_variants.LinkNet, seg_variants.PSPNetSeg])
@pytest.mark.slow
def test_seg_variants_shapes(cls):
    model = cls(classes=4, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits, _ = model.apply(variables, x, train=True, mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(1)})
    assert logits.shape == (1, 64, 96, 4)
    # eval mode needs no rngs
    logits2 = model.apply(variables, x)
    assert logits2.shape == (1, 64, 96, 4)


def test_segnet_unpooling_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)), jnp.float32)
    pooled, onehot = segnet.max_pool_with_indices(x)
    assert pooled.shape == (1, 4, 4, 2)
    unpooled = segnet.max_unpool(pooled, onehot)
    # unpooled equals x at the argmax positions and 0 elsewhere (torch
    # MaxUnpool semantics)
    un = np.asarray(unpooled)
    xx = np.asarray(x)
    nz = un != 0
    np.testing.assert_allclose(un[nz], xx[nz], atol=1e-6)
    # exactly one nonzero per 2x2 window wherever the max was nonzero
    win = un.reshape(1, 4, 2, 4, 2, 2)
    counts = (win != 0).sum(axis=(2, 4))
    assert counts.max() == 1


@pytest.mark.slow
def test_segnet_forward():
    model = segnet.SegNet(classes=5, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert logits.shape == (1, 32, 32, 5)
    labels = jnp.zeros((1, 32, 32), jnp.int32)
    loss = segnet.cross_entropy_loss(labels, logits)
    assert np.isfinite(float(loss))


def test_config_defaults():
    cfg = cfg_mod.AppConfig()
    assert cfg.labels.threshold == 30.0
    assert cfg.reconstruction.n_viewpoints == 30
    assert cfg.pose.decay_margin == 0.016
    assert cfg.serving.num_points == 1000
    np.testing.assert_allclose(cfg.reference_point_array(), [0.0, -767.5, 0.0])


@pytest.mark.slow
def test_vanilla_segnet_trainer(tmp_path):
    """Legacy vanilla_segmentation trainer parity: per-epoch log files,
    best-CE checkpoints, loss decreasing on a learnable toy problem."""
    import os

    from autoposeestimation_tpu.train import vanilla_segnet as vs

    rng = np.random.default_rng(0)
    # toy: 2-class segmentation of a bright square on dark background
    def make(n):
        imgs, labels = [], []
        for i in range(n):
            img = rng.uniform(0, 0.2, (32, 32, 3)).astype(np.float32)
            lab = np.zeros((32, 32), np.int32)
            r, c = rng.integers(4, 20, 2)
            img[r:r + 8, c:c + 8] += 0.7
            lab[r:r + 8, c:c + 8] = 1
            imgs.append(img)
            labels.append(lab)
        return np.stack(imgs), np.stack(labels)

    xi, yi = make(8)
    xt, yt = make(4)
    tb = lambda: [{"image": jnp.asarray(xi[i:i + 4]),
                   "label": jnp.asarray(yi[i:i + 4])} for i in (0, 4)]
    vb = lambda: [{"image": jnp.asarray(xt), "label": jnp.asarray(yt)}]
    out = vs.train_vanilla_segnet(
        tb, vb, n_classes=2, n_epochs=4, lr=3e-3,
        log_dir=str(tmp_path / "logs"),
        model_save_path=str(tmp_path / "models"),
        sample_shape=(32, 32))
    logs = sorted(os.listdir(tmp_path / "logs"))
    assert "epoch_1_log.txt" in logs and "epoch_1_test_log.txt" in logs
    txt = open(tmp_path / "logs" / "epoch_1_log.txt").read()
    assert "CEloss" in txt and "Train Finish Avg CEloss" in txt
    saved = os.listdir(tmp_path / "models")
    assert any(f.startswith("model_") and f.endswith(".npz") for f in saved)
    assert out["best_val_cost"] < 0.69  # below ln(2) = learned something
