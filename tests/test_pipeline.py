"""End-to-end jitted full_prediction on a synthetic scene with random-weight
models: verifies the graph compiles, the class gating, mask extraction, and
the output dict contract. Uses tiny image/crop sizes for CPU test speed."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoposeestimation_tpu.pipeline import predict
from autoposeestimation_tpu.train import checkpoints
from autoposeestimation_tpu.utils.io import Intrinsics


H, W = 96, 128


@pytest.fixture(scope="module")
def models():
    rng = np.random.default_rng(0)
    model_points = rng.normal(size=(2, 60, 3)).astype(np.float32) * 0.05
    return predict.build_models(
        num_classes_fg=2, model_points=model_points, classes=("mug", "box"),
        num_points=64, crop=32, refine_iters=2, dtype=jnp.float32,
        img_hw=(H, W))


def scene():
    rng = np.random.default_rng(1)
    image = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    depth = np.full((H, W), 800.0, np.float32)
    meta = {"intr": Intrinsics(width=W, height=H, ppx=W / 2, ppy=H / 2,
                               fx=120.0, fy=120.0),
            "depth_scale": 0.001}
    return image, depth, meta


@pytest.mark.slow
def test_full_prediction_contract(models):
    image, depth, meta = scene()
    out = predict.full_prediction(image, depth, meta, models,
                                  key=jax.random.PRNGKey(0))
    assert set(out.keys()) == {"predictions", "elapsed_times",
                               "cca_converged"}
    for k in ("segmentation", "pose_estimation", "total"):
        assert k in out["elapsed_times"]
    assert set(out["cca_converged"]) == {"mug", "box"}
    for cls, p in out["predictions"].items():
        assert cls in ("mug", "box")
        assert p["mask"].shape == (H, W)
        assert set(np.unique(p["mask"])) <= {0, 255}
        assert p["position"].shape == (3,)
        assert p["rotation"].shape == (4,)
        np.testing.assert_allclose(np.linalg.norm(p["rotation"]), 1.0, atol=1e-4)


def test_class_mask_sum_rule_rejects_confident_fragment():
    """Round-5 serving-attribution regression: two components of one class —
    the true body (large, mean prob 0.98) and a small false-positive
    fragment on another object (mean prob 0.99). The reference's live-path
    mean rule picks the fragment (12/36 held-out frames for the demo's
    obj2, served ADD 88 mm); the serving default cca_rule='sum' must pick
    the body, and cca_rule='mean_float' must stay reference-exact."""
    h, w = 48, 64
    pred_arg = np.zeros((h, w), np.int32)
    score = np.zeros((h, w), np.float32)
    pred_arg[10:24, 8:24] = 1          # body: 14x16 = 224 px
    score[10:24, 8:24] = 0.98
    pred_arg[30:40, 40:52] = 1         # fragment: 10x12 = 120 px
    score[30:40, 40:52] = 0.99
    body = (slice(10, 24), slice(8, 24))
    frag = (slice(30, 40), slice(40, 52))

    for scale in (1, 8):
        comp, found, _ = predict._class_mask(
            jnp.asarray(score), jnp.asarray(pred_arg), 1,
            cca_scale=scale, cca_sweeps=3)
        comp = np.asarray(comp)
        assert bool(found)
        assert comp[body].all() and not comp[frag].any(), f"scale={scale}"

        ref, found_ref, _ = predict._class_mask(
            jnp.asarray(score), jnp.asarray(pred_arg), 1,
            cca_scale=scale, cca_sweeps=3, cca_rule="mean_float")
        ref = np.asarray(ref)
        assert bool(found_ref)
        assert ref[frag].all() and not ref[body].any(), f"scale={scale}"


def test_class_mask_seg_stride_lattice():
    """seg_stride > 1 (the relowered U-Net decoder): planes arrive on the
    /s lattice, the found-count gate is scaled back to full-res pixels, and
    the selected component returns nearest-upsampled at full_hw. Component
    SELECTION must match running the same scene at full res."""
    h, w, s = 48, 64, 2
    pred_arg = np.zeros((h, w), np.int32)
    score = np.zeros((h, w), np.float32)
    pred_arg[8:24, 8:32] = 1           # body, 16x24
    score[8:24, 8:32] = 0.9
    pred_arg[36:44, 40:56] = 1         # smaller fragment
    score[36:44, 40:56] = 0.95
    full, found_full, _ = predict._class_mask(
        jnp.asarray(score), jnp.asarray(pred_arg), 1, cca_scale=4,
        cca_sweeps=3)
    low, found_low, _ = predict._class_mask(
        jnp.asarray(score[::s, ::s]), jnp.asarray(pred_arg[::s, ::s]), 1,
        cca_scale=4, cca_sweeps=3, seg_stride=s, full_hw=(h, w))
    assert bool(found_full) and bool(found_low)
    low = np.asarray(low)
    assert low.shape == (h, w)
    # block-aligned components: the upsampled /2 selection IS the full-res one
    np.testing.assert_array_equal(low, np.asarray(full))
    # found-count gate scales by s^2: a 36-px full-res body (9 px at /2)
    # must clear min_count=100 only via the scaled count, i.e. NOT
    pred_small = np.zeros((h // s, w // s), np.int32)
    pred_small[2:5, 2:5] = 1           # 9 px at /2 -> 36 full-res px < 100
    sc_small = (pred_small > 0).astype(np.float32)
    _, found_small, _ = predict._class_mask(
        jnp.asarray(sc_small), jnp.asarray(pred_small), 1, cca_scale=4,
        cca_sweeps=3, seg_stride=s, full_hw=(h, w))
    assert not bool(found_small)


def test_full_prediction_seg_out_stride(models):
    """The seg_out_stride=4 serving graph (relowered U-Net decoder) shares
    the exact build's weights verbatim (identical param tree) and keeps the
    full-res output contract: full-res masks, full-res argmax, same class
    keys. Accuracy is gated on the trained demo (scripts/attribute_serving
    --seg-out-stride), not with random weights here."""
    image, depth, meta = scene()
    m_u4 = predict.build_models(
        num_classes_fg=2, model_points=np.asarray(models.model_points),
        classes=models.classes, num_points=64, crop=32, refine_iters=2,
        dtype=jnp.float32, img_hw=(H, W), seg_out_stride=4)
    assert m_u4.seg_model.out_stride == 4
    m_u4 = m_u4._replace(seg_vars=models.seg_vars,
                         pose_vars=models.pose_vars,
                         refine_vars=models.refine_vars)
    out = predict.full_prediction(image, depth, meta, m_u4,
                                  key=jax.random.PRNGKey(0))
    for cls, p in out["predictions"].items():
        assert p["mask"].shape == (H, W)
        assert p["position"].shape == (3,)
        # the /4-lattice mask is block-constant on 4x4 cells
        m = p["mask"].reshape(H // 4, 4, W // 4, 4)
        assert (m == m[:, :1, :, :1]).all()


def test_mask_bitpacking_roundtrip():
    """_pack_masks (device, MSB-first) and _unpack_masks (host
    np.unpackbits) are exact inverses — the packed form is the masks' 8x
    smaller wire format for every W % 8 == 0 resolution."""
    rng = np.random.default_rng(2)
    masks = rng.random((3, 17, 40)) > 0.5
    packed = np.asarray(predict._pack_masks(jnp.asarray(masks)))
    assert packed.shape == (3, 17, 5) and packed.dtype == np.uint8
    np.testing.assert_array_equal(predict._unpack_masks(packed), masks)


def test_full_prediction_uint16_depth(models):
    """The serving graphs cast depth on DEVICE, so callers can upload the
    camera's raw uint16 frames (half the depth uplink bytes on remote
    links). Integer-valued uint16 and float32 depth must predict
    identically."""
    image, depth, meta = scene()  # depth is integer-valued (800.0 mm)
    key = jax.random.PRNGKey(5)
    out_f32 = predict.full_prediction(image, depth.astype(np.float32),
                                      meta, models, key=key)
    out_u16 = predict.full_prediction(image, depth.astype(np.uint16),
                                      meta, models, key=key)
    assert set(out_f32["predictions"]) == set(out_u16["predictions"])
    for cls, p in out_f32["predictions"].items():
        np.testing.assert_array_equal(out_u16["predictions"][cls]["mask"],
                                      p["mask"])
        np.testing.assert_allclose(out_u16["predictions"][cls]["position"],
                                   p["position"], atol=1e-6)


def test_full_prediction_depth_gate(models):
    image, depth, meta = scene()
    depth[:] = 0.0  # no depth anywhere -> no pose for any class
    out = predict.full_prediction(image, depth, meta, models,
                                  key=jax.random.PRNGKey(0))
    assert out["predictions"] == {}


def test_full_prediction_jit_reuses_compilation(models):
    image, depth, meta = scene()
    predict.full_prediction(image, depth, meta, models, key=jax.random.PRNGKey(0))
    t = predict._full_prediction_jit._cache_size()
    predict.full_prediction(image, depth, meta, models, key=jax.random.PRNGKey(1))
    assert predict._full_prediction_jit._cache_size() == t


def test_full_prediction_dil_s2b_parity(models):
    """The space-to-batch lowering of the PSPNet's dilated blocks is an exact
    conv relowering with an identical param tree (models/resnet.BasicBlockPlain)
    — the SERVING graph must produce identical predictions with it on. Guards
    the build_models threading, not the block math (tests/test_models.py)."""
    image, depth, meta = scene()
    m_s2b = predict.build_models(
        num_classes_fg=2, model_points=np.asarray(models.model_points),
        classes=models.classes, num_points=64, crop=32, refine_iters=2,
        dtype=jnp.float32, img_hw=(H, W), dil_s2b=True)
    assert m_s2b.posenet.dil_s2b
    # identical param tree -> share the base build's weights verbatim
    m_s2b = m_s2b._replace(seg_vars=models.seg_vars,
                           pose_vars=models.pose_vars,
                           refine_vars=models.refine_vars)
    base = predict.full_prediction(image, depth, meta, models,
                                   key=jax.random.PRNGKey(0))
    out = predict.full_prediction(image, depth, meta, m_s2b,
                                  key=jax.random.PRNGKey(0))
    assert set(out["predictions"]) == set(base["predictions"])
    for cls, p in base["predictions"].items():
        q = out["predictions"][cls]
        np.testing.assert_array_equal(p["mask"], q["mask"])
        np.testing.assert_allclose(q["position"], p["position"], atol=1e-5)
        np.testing.assert_allclose(q["rotation"], p["rotation"], atol=1e-5)


def test_get_robot2object(models):
    class FakeController:
        def get_pose(self, return_mm=True):
            return {"x": 100.0, "y": 0.0, "z": 50.0, "a": 0.0, "b": 0.0, "c": 0.0}

    prediction = {"predictions": {"mug": {
        "mask": np.zeros((H, W), np.uint8),
        "position": np.asarray([0.0, 0.0, 0.5]),
        "rotation": np.asarray([1.0, 0.0, 0.0, 0.0]),
    }}}
    end2cam = np.eye(4)
    out = predict.get_robot2object(prediction, FakeController(), end2cam)
    np.testing.assert_allclose(out["predictions"]["mug"]["position"],
                               [0.1, 0.0, 0.55], atol=1e-6)


def test_checkpoint_roundtrip(tmp_path, models):
    path = str(tmp_path / "seg.ckpt")
    checkpoints.save_checkpoint(path, models.seg_vars, meta={"epoch": 3})
    back = checkpoints.load_checkpoint(path, like_variables=models.seg_vars)
    assert back["meta"]["epoch"] == 3
    leaves_a = jax.tree_util.tree_leaves(models.seg_vars)
    leaves_b = jax.tree_util.tree_leaves(back["variables"])
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_serving_pose_path_matches_dataset_path(tmp_path_factory):
    """The serving graph's mask->pose stage must be the SAME function as the
    training-data path: identical window, pixel order, backprojection, crop
    resampling, and normalization. Forced into the deterministic wrap-pad
    regime (num_pt > masked pixels), both must produce identical PoseNet
    inputs and hence identical poses — any drift is a silent train/serve
    skew of exactly the kind that poisons deployment accuracy."""
    from autoposeestimation_tpu.data import pose_dataset
    from autoposeestimation_tpu.models import losses
    from autoposeestimation_tpu.utils import io, synthetic

    root = str(tmp_path_factory.mktemp("serveparity"))
    synthetic.make_dataset(root, cfg=synthetic.SynthConfig(n_viewpoints=6))
    import os
    classes = io.read_lines(os.path.join(
        io.dataset_dir(root, "pose_estimation", "synth"), "classes.txt"))
    num_pt = 1024  # > masked pixel count -> wrap-pad (deterministic) path
    ds = pose_dataset.PoseDataset(root, "synth", mode="test",
                                  num_pt=num_pt, num_pt_mesh=64, crop=64)
    stem = ds.items[0]
    item = ds[0]
    assert item is not None

    mp = np.stack([np.asarray(io.read_xyz(os.path.join(
        io.pc_dir(root), c, c + ".xyz"))[:50] / 1000.0, np.float32)
        for c in classes])
    models = predict.build_models(
        num_classes_fg=len(classes), model_points=mp, classes=classes,
        num_points=num_pt, crop=64, refine_iters=0, dtype=jnp.float32,
        img_hw=(128, 160))

    meta = io.read_sample_meta(os.path.join(io.data_dir(root),
                                            stem + ".meta.json"))
    image = io.read_color(os.path.join(io.data_dir(root),
                                       stem + ".color.png"))
    depth = io.read_depth(os.path.join(
        io.data_dir(root), stem + ".depth.png")).astype(np.float32)
    label = io.read_label(os.path.join(io.label_dir(root),
                                       stem + ".new_pred.label.png"))
    cls = classes[int(item["obj_idx"])]
    out = predict.pose_from_mask(image, depth, meta, models, label == 255,
                                 cls, refine_iters=0)

    # dataset-path pose through the same weights
    pr, pt, pc, _ = models.posenet.apply(
        models.pose_vars, item["img"][None], item["cloud"][None],
        item["choose"][None], np.asarray([int(item["obj_idx"])], np.int32))
    quat, trans = losses.estimator_prediction(pr, pt, pc,
                                              item["cloud"][None])
    np.testing.assert_allclose(out["position"], np.asarray(trans)[0],
                               atol=1e-5)
    np.testing.assert_allclose(np.abs(np.dot(out["rotation"],
                                             np.asarray(quat)[0])), 1.0,
                               atol=1e-5)


def test_batched_matches_single_frame(models):
    """The flat-lane batched graph must reproduce the single-frame graph
    exactly: frame i of the batch with key split(key, B)[i] equals the
    single-frame graph run with that key (same masks, quats, positions,
    found gates). Guards the round-4 batched-graph restructuring."""
    rng = np.random.default_rng(7)
    b = 3
    images = rng.integers(0, 255, (b, H, W, 3)).astype(np.uint8)
    # give frames structure so CCA picks real components per frame
    depths = np.full((b, H, W), 800.0, np.float32)
    for i in range(b):
        images[i, 20:60, 30 + 10 * i:90, :] = (200, 30 + 60 * i, 40)
    intr = jnp.asarray([120.0, 120.0, W / 2, H / 2], jnp.float32)
    static = predict.static_tuple(models)
    key = jax.random.PRNGKey(42)

    out_b = predict._full_prediction_batched_jit(
        models.seg_vars, models.pose_vars, models.refine_vars,
        jnp.asarray(images), jnp.asarray(depths), intr, jnp.float32(0.001),
        key, static)
    frame_keys = jax.random.split(key, b)
    for i in range(b):
        out_s = predict._full_prediction_jit(
            models.seg_vars, models.pose_vars, models.refine_vars,
            jnp.asarray(images[i]), jnp.asarray(depths[i]), intr,
            jnp.float32(0.001), frame_keys[i], static)
        np.testing.assert_array_equal(np.asarray(out_b["found"][i]),
                                      np.asarray(out_s["found"]))
        np.testing.assert_array_equal(np.asarray(out_b["masks"][i]),
                                      np.asarray(out_s["masks"]))
        np.testing.assert_array_equal(np.asarray(out_b["argmax"][i]),
                                      np.asarray(out_s["argmax"]))
        np.testing.assert_allclose(np.asarray(out_b["quats"][i]),
                                   np.asarray(out_s["quats"]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_b["positions"][i]),
                                   np.asarray(out_s["positions"]),
                                   atol=1e-5)


def test_serve_stream_matches_sequential(models):
    """Dispatch-ahead pipelined serving yields the same predictions, in
    order, as the blocking wrapper called with the same per-frame keys."""
    rng = np.random.default_rng(3)
    n = 5
    frames = []
    for i in range(n):
        image = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
        image[30:70, 40:100] = (210, 40, 40)
        depth = np.full((H, W), 750.0 + 10 * i, np.float32)
        meta = {"intr": Intrinsics(width=W, height=H, ppx=W / 2, ppy=H / 2,
                                   fx=120.0, fy=120.0),
                "depth_scale": 0.001}
        frames.append((image, depth, meta))

    key = jax.random.PRNGKey(11)
    got = list(predict.serve_stream(iter(frames), models, in_flight=2,
                                    key=key))
    assert len(got) == n
    for i, (image, depth, meta) in enumerate(frames):
        want = predict.full_prediction(image, depth, meta, models,
                                       key=jax.random.fold_in(key, i))
        assert set(got[i]["predictions"]) == set(want["predictions"])
        for cls, p in want["predictions"].items():
            np.testing.assert_allclose(got[i]["predictions"][cls]["position"],
                                       p["position"], atol=1e-6)
            np.testing.assert_array_equal(got[i]["predictions"][cls]["mask"],
                                          p["mask"])

    # want_masks=False drops the heavy per-class mask readback
    lite = list(predict.serve_stream(iter(frames[:2]), models, in_flight=1,
                                     want_masks=False, key=key))
    for d in lite:
        for p in d["predictions"].values():
            assert "mask" not in p and "position" in p


def test_serve_stream_batched(models):
    """batch>1 dispatches B frames per device call through the batched
    graph. Semantics pinned: frame i of the batch starting at stream index
    f0 equals the single-frame graph run with key
    split(fold_in(key, f0), batch)[i - f0]; a tail shorter than `batch` is
    pad-by-repeat (same static shape) with the padding outputs dropped."""
    rng = np.random.default_rng(7)
    n, b = 5, 3  # 5 frames, batch 3 -> one full batch + a padded tail of 2
    frames = []
    for i in range(n):
        image = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
        image[30:70, 40:100] = (210, 40, 40)
        depth = np.full((H, W), 750.0 + 10 * i, np.float32)
        meta = {"intr": Intrinsics(width=W, height=H, ppx=W / 2, ppy=H / 2,
                                   fx=120.0, fy=120.0),
                "depth_scale": 0.001}
        frames.append((image, depth, meta))

    key = jax.random.PRNGKey(23)
    got = list(predict.serve_stream(iter(frames), models, in_flight=1,
                                    key=key, batch=b))
    assert len(got) == n
    for i, (image, depth, meta) in enumerate(frames):
        f0 = (i // b) * b
        k_i = jax.random.split(jax.random.fold_in(key, f0), b)[i - f0]
        want = predict.full_prediction(image, depth, meta, models, key=k_i)
        assert set(got[i]["predictions"]) == set(want["predictions"])
        for cls, p in want["predictions"].items():
            np.testing.assert_allclose(
                got[i]["predictions"][cls]["position"], p["position"],
                atol=1e-5)
            np.testing.assert_array_equal(
                got[i]["predictions"][cls]["mask"], p["mask"])

    # an intrinsics change mid-stream flushes the open batch (results stay
    # in order and none are dropped)
    frames2 = [frames[0], frames[1],
               (frames[2][0], frames[2][1],
                {"intr": Intrinsics(width=W, height=H, ppx=W / 2, ppy=H / 2,
                                    fx=150.0, fy=150.0),
                 "depth_scale": 0.001})]
    got2 = list(predict.serve_stream(iter(frames2), models, in_flight=1,
                                     key=key, batch=b, want_masks=False))
    assert len(got2) == 3


def test_symmetry_aware_emb_stride_autoselect(tmp_path_factory):
    """get_prediction_models auto-selects the embedding-decoder stride from
    the dataset's symmetry flags (round-4 trained-demo ADD sweeps,
    artifacts/stride_sweep_round4*.json: symmetric classes regress ~16 mm
    ADD at any stride > 2; every non-symmetric class passes at 8)."""
    import numpy as np

    from autoposeestimation_tpu.utils import synthetic

    cfg = synthetic.SynthConfig(img_h=64, img_w=80, fx=120.0, fy=120.0,
                                n_viewpoints=3)

    root_sym = str(tmp_path_factory.mktemp("sym"))
    synthetic.make_dataset(root_sym, cfg=cfg, objects=[
        synthetic.SphereObject("a", np.asarray([40.0, 0.0, 35.0]), 35.0,
                               (200, 40, 40), symmetric=1),
        synthetic.SphereObject("b", np.asarray([-50.0, 30.0, 28.0]), 28.0,
                               (40, 60, 200), symmetric=0)])
    root_nosym = str(tmp_path_factory.mktemp("nosym"))
    synthetic.make_dataset(root_nosym, cfg=cfg, objects=[
        synthetic.SphereObject("a", np.asarray([40.0, 0.0, 35.0]), 35.0,
                               (200, 40, 40), symmetric=0)])

    import os

    from autoposeestimation_tpu.utils import io

    for root, want in ((root_sym, True), (root_nosym, False)):
        classes = io.read_lines(os.path.join(
            io.dataset_dir(root, "segmentation", "synth"), "classes.txt"))
        assert predict.dataset_has_symmetric(root, classes) is want
