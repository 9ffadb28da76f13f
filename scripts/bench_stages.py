"""Stage-level timing of the fused serving graph, scan-serialized.

Each stage is timed as ONE jitted lax.scan over `iters` steps whose input
depends on the previous step's output (no dispatch pipelining, no trust in
block_until_ready through the tunnel) ending in a host readback. Prints one
JSON line per stage.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def scan_time(make_step, carry0, iters=10, trials=3):
    """make_step: (carry, i) -> (new_carry, small_output). Returns median
    seconds per step, serialized on device."""
    @jax.jit
    def loop(c0):
        def step(c, i):
            return make_step(c, i)
        c, outs = jax.lax.scan(step, c0, jnp.arange(iters, dtype=jnp.uint32))
        return outs

    _ = np.asarray(jax.tree_util.tree_leaves(loop(carry0))[0])  # compile
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        _ = np.asarray(jax.tree_util.tree_leaves(loop(carry0))[0])
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[trials // 2]


def emit(metric, seconds):
    print(json.dumps({"metric": metric, "value": round(seconds * 1000, 3),
                      "unit": "ms/step"}), flush=True)


def main():
    from autoposeestimation_tpu.models import losses
    from autoposeestimation_tpu.ops import cca as cca_ops
    from autoposeestimation_tpu.ops import projection as proj
    from autoposeestimation_tpu.pipeline import predict

    num_classes, num_points, crop, h, w = 5, 1000, 320, 480, 640
    rng = np.random.default_rng(0)
    model_points = rng.normal(size=(num_classes, 1000, 3)).astype(
        np.float32) * 0.05
    models = predict.build_models(
        num_classes_fg=num_classes, model_points=model_points,
        classes=tuple(f"obj{i}" for i in range(num_classes)),
        num_points=num_points, crop=crop, refine_iters=2,
        dtype=jnp.bfloat16, img_hw=(h, w))

    from autoposeestimation_tpu.utils import synthetic
    cfg = synthetic.SynthConfig(img_h=h, img_w=w, fx=600.0, fy=600.0,
                                ring_radius=500.0, ring_height=450.0)
    spheres = [
        synthetic.SphereObject(
            f"obj{i}",
            np.asarray([120.0 * np.cos(a), 120.0 * np.sin(a), 40.0]),
            45.0, tuple(int(v) for v in rng.integers(60, 255, 3)))
        for i, a in enumerate(np.linspace(0, 2 * np.pi, num_classes,
                                          endpoint=False))]
    cam = synthetic.ring_cameras(cfg, np.zeros(3))[0]
    image, depth, _ = synthetic.render(cfg, cam, spheres)
    image_d = jnp.asarray(image)
    depth_d = jnp.asarray(depth.astype(np.float32))
    intr = jnp.asarray([600.0, 600.0, 320.0, 240.0], jnp.float32)

    # precompute the intermediates once (host side references)
    probs, pred_arg = predict._segment(models.seg_model, models.seg_vars,
                                       image_d)
    cls_ids = jnp.arange(1, num_classes + 1, dtype=jnp.int32)
    masks, found, _cv = jax.vmap(
        lambda sp, c: predict._class_mask(sp, pred_arg, c))(
        jnp.transpose(probs, (2, 0, 1))[1:num_classes + 1], cls_ids)
    masks = jax.block_until_ready(masks)

    # --- stage 1: U-Net forward + softmax/argmax ------------------------
    def seg_step(c, i):
        img = image_d + c  # uint8 add, carries dependence
        p, a = predict._segment(models.seg_model, models.seg_vars, img)
        return (a.sum() * 0).astype(jnp.uint8), a[0, 0]
    emit("unet_segment", scan_time(seg_step, jnp.uint8(0)))

    # --- stage 2: per-class CCA (vmapped best component) ----------------
    def cca_step(c, i):
        pa = pred_arg + c
        m, f, _cv = jax.vmap(
            lambda sp, cl: predict._class_mask(sp, pa, cl))(
            jnp.transpose(probs, (2, 0, 1))[1:num_classes + 1], cls_ids)
        return (m.sum() * 0).astype(jnp.int32), f
    emit("cca_5class_fullres", scan_time(cca_step, jnp.int32(0)))

    def cca_step4(c, i):
        pa = pred_arg + c
        m, f, _cv = jax.vmap(
            lambda sp, cl: predict._class_mask(sp, pa, cl,
                                               cca_scale=4))(
            jnp.transpose(probs, (2, 0, 1))[1:num_classes + 1], cls_ids)
        return (m.sum() * 0).astype(jnp.int32), f
    emit("cca_5class_scale4", scan_time(cca_step4, jnp.int32(0)))

    # --- stage 2b: single-class CCA -------------------------------------
    def cca1_step(c, i):
        m, f, _cv = predict._class_mask(probs[..., 1], pred_arg + c, jnp.int32(1))
        return (m.sum() * 0).astype(jnp.int32), f
    emit("cca_1class", scan_time(cca1_step, jnp.int32(0)))

    # --- stage 3: crop/choose/backproject (5 classes) -------------------
    keys = jax.random.split(jax.random.PRNGKey(0), num_classes)

    def crop_step(c, i):
        def per_class(mask, k2):
            r0, c0_, win = proj.zoom_window_bbox(mask, crop, h, w)
            cloud, choose, count = proj.backproject_choose_zoom(
                depth_d + jnp.float32(c), mask, intr, jnp.float32(0.001),
                r0, c0_, win, crop, num_points, k2)
            img_crop = proj.resample_window(image_d, r0, c0_, win, crop)
            return cloud, choose, count
        clouds, chooses, counts = jax.vmap(per_class)(masks, keys)
        return (clouds.sum() * 0).astype(jnp.float32), counts
    emit("crop_choose_backproject_5class",
         scan_time(crop_step, jnp.float32(0)))

    # --- stage 4: PoseNet + 2 refine iterations (5 slots) ---------------
    def per_class2(mask, k2):
        r0, c0_, win = proj.zoom_window_bbox(mask, crop, h, w)
        cloud, choose, count = proj.backproject_choose_zoom(
            depth_d, mask, intr, jnp.float32(0.001), r0, c0_, win, crop,
            num_points, k2)
        from autoposeestimation_tpu.models.common import normalize_imagenet
        img_crop = proj.resample_window(image_d, r0, c0_, win, crop)
        return cloud, choose, count, normalize_imagenet(img_crop)

    clouds, chooses, counts, crops = jax.vmap(per_class2)(masks, keys)
    clouds = jax.block_until_ready(clouds)
    obj_idx = jnp.arange(num_classes, dtype=jnp.int32)

    def pose_step(c, i):
        pr, pt, pc, emb = models.posenet.apply(
            models.pose_vars, crops + c, clouds, chooses, obj_idx)
        quat, trans = losses.estimator_prediction(pr, pt, pc, clouds)
        new_points = losses.rebase_points(quat, trans, clouds)
        for _ in range(2):
            dr, dt = models.refiner.apply(models.refine_vars, new_points,
                                          emb, obj_idx)
            quat, trans = losses.compose_refined(dr, dt, quat, trans)
            new_points = losses.rebase_points(quat, trans, clouds)
        return (trans.sum() * 0).astype(crops.dtype), trans
    emit("posenet_refine_5slot", scan_time(pose_step, jnp.zeros(
        (), jnp.bfloat16).astype(crops.dtype)))


if __name__ == "__main__":
    main()
