"""Cumulative-prefix attribution of the fused serving graph + train-step
sub-stages, scan-serialized on the real chip.

Stage benches (bench_stages.py) time stages in isolation; summing them missed
~20 ms of inter-stage glue in round 2 (VERDICT weak #1). Here each timing is a
PREFIX of the actual serving graph (seg; seg+cca; seg+cca+perclass; full), so
consecutive diffs attribute everything, including glue the isolated benches
DCE'd away (e.g. the color-crop resample feeding PoseNet).

Train-step section (VERDICT r2 task 2): PSPNet fwd, PoseNet fwd, sym-loss
fwd, sym-loss bwd, full estimator_step, full refiner_step — all as one jitted
lax.scan with a real data dependence (the step's updated vars/opt feed the
next iteration) ending in a host readback.

Prints one JSON line per metric.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def scan_time(make_step, carry0, iters=15, trials=3):
    @jax.jit
    def loop(c0):
        c, outs = jax.lax.scan(make_step, c0,
                               jnp.arange(iters, dtype=jnp.uint32))
        return outs

    _ = np.asarray(jax.tree_util.tree_leaves(loop(carry0))[0])  # compile
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        _ = np.asarray(jax.tree_util.tree_leaves(loop(carry0))[0])
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[trials // 2]


def emit(metric, seconds, extra=None):
    d = {"metric": metric, "value": round(seconds * 1000, 3),
         "unit": "ms/step"}
    if extra:
        d.update(extra)
    print(json.dumps(d), flush=True)


def serving_section():
    from autoposeestimation_tpu.models import losses
    from autoposeestimation_tpu.models.common import normalize_imagenet
    from autoposeestimation_tpu.ops import projection as proj
    from autoposeestimation_tpu.pipeline import predict
    from autoposeestimation_tpu.utils import synthetic

    num_classes, num_points, crop, h, w = 5, 1000, 320, 480, 640
    rng = np.random.default_rng(0)
    model_points = rng.normal(size=(num_classes, 1000, 3)).astype(
        np.float32) * 0.05
    models = predict.build_models(
        num_classes_fg=num_classes, model_points=model_points,
        classes=tuple(f"obj{i}" for i in range(num_classes)),
        num_points=num_points, crop=crop, refine_iters=2,
        dtype=jnp.bfloat16, img_hw=(h, w))
    cca_scale = models.cca_scale
    cca_sweeps = models.cca_sweeps

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
    cls_ids = jnp.arange(1, num_classes + 1, dtype=jnp.int32)
    obj_idx = jnp.arange(num_classes, dtype=jnp.int32)

    def prefix_seg(c, i):
        probs, pred_arg = predict._segment(models.seg_model, models.seg_vars,
                                           image_d + c)
        return (pred_arg.sum() * 0).astype(jnp.uint8), pred_arg[0, 0]

    def prefix_cca(c, i):
        probs, pred_arg = predict._segment(models.seg_model, models.seg_vars,
                                           image_d + c)
        masks, found, _cv = jax.vmap(
            lambda sp, cl: predict._class_mask(sp, pred_arg, cl,
                                               cca_scale=cca_scale,
                                               cca_sweeps=cca_sweeps))(
            jnp.transpose(probs, (2, 0, 1))[1:num_classes + 1], cls_ids)
        return (masks.sum() * 0).astype(jnp.uint8), found

    def make_perclass(c, i, with_pose):
        probs, pred_arg = predict._segment(models.seg_model, models.seg_vars,
                                           image_d + c)
        masks, found, _cv = jax.vmap(
            lambda sp, cl: predict._class_mask(sp, pred_arg, cl,
                                               cca_scale=cca_scale,
                                               cca_sweeps=cca_sweeps))(
            jnp.transpose(probs, (2, 0, 1))[1:num_classes + 1], cls_ids)
        keys = jax.random.split(jax.random.fold_in(
            jax.random.PRNGKey(0), i), num_classes)

        def per_class(mask, k2):
            r0, c0_, win = proj.zoom_window_bbox(mask, crop, h, w)
            cloud, choose, count = proj.backproject_choose_zoom(
                depth_d, mask, intr, jnp.float32(0.001), r0, c0_, win, crop,
                num_points, k2)
            img_crop = proj.resample_window(image_d, r0, c0_, win, crop)
            return cloud, choose, count, normalize_imagenet(img_crop)

        clouds, chooses, counts, crops = jax.vmap(per_class)(masks, keys)
        if not with_pose:
            # crops must reach the output or XLA DCEs the color resample
            dep = (clouds.sum() + crops.astype(jnp.float32).sum()
                   + chooses.sum()) * 0
            return (dep).astype(jnp.uint8), counts
        pred_r, pred_t, pred_c, emb = models.posenet.apply(
            models.pose_vars, crops, clouds, chooses, obj_idx)
        quat, trans = losses.estimator_prediction(pred_r, pred_t, pred_c,
                                                  clouds)
        new_points = losses.rebase_points(quat, trans, clouds)
        for _ in range(2):
            dr, dt = models.refiner.apply(models.refine_vars, new_points, emb,
                                          obj_idx)
            quat, trans = losses.compose_refined(dr, dt, quat, trans)
            new_points = losses.rebase_points(quat, trans, clouds)
        return (trans.sum() * 0).astype(jnp.uint8), trans

    emit("prefix1_seg", scan_time(prefix_seg, jnp.uint8(0)))
    emit("prefix2_seg_cca", scan_time(prefix_cca, jnp.uint8(0)))
    emit("prefix3_seg_cca_perclass", scan_time(
        lambda c, i: make_perclass(c, i, False), jnp.uint8(0)))
    full_s = scan_time(lambda c, i: make_perclass(c, i, True), jnp.uint8(0))
    emit("prefix4_full", full_s, {"fps": round(1.0 / full_s, 2)})


def train_section():
    from autoposeestimation_tpu.models import densefusion, losses
    from autoposeestimation_tpu.train import densefusion as dft

    # m follows DFConfig.num_points_mesh (500 = reference parity; the loss
    # trains at num_pt_mesh_small everywhere in the reference)
    num_obj, bs, n, m, crop = 5, 8, 1000, dft.DFConfig.num_points_mesh, 320
    rng = np.random.default_rng(1)
    posenet = densefusion.PoseNet(num_obj=num_obj, dtype=jnp.bfloat16)
    refiner = densefusion.PoseRefineNet(num_obj=num_obj, dtype=jnp.bfloat16)
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    img = jnp.asarray(rng.normal(size=(bs, crop, crop, 3)), jnp.float32)
    cloud = jnp.asarray(rng.normal(size=(bs, n, 3)) * 0.1, jnp.float32)
    choose = jnp.asarray(rng.integers(0, crop * crop, (bs, n)), jnp.int32)
    target = jnp.asarray(rng.normal(size=(bs, m, 3)) * 0.05, jnp.float32)
    model_points = jnp.asarray(rng.normal(size=(bs, m, 3)) * 0.05, jnp.float32)
    obj_idx = jnp.asarray(rng.integers(0, num_obj, bs), jnp.int32)
    is_sym = jnp.asarray([True, False] * (bs // 2))
    pose_vars = posenet.init(k0, img, cloud, choose, obj_idx)
    refine_vars = refiner.init(k1, cloud, jnp.zeros((bs, n, 32)), obj_idx)
    batch = {"img": img, "cloud": cloud, "choose": choose, "target": target,
             "model_points": model_points, "obj_idx": obj_idx,
             "is_sym": is_sym, "dropout_rng": jax.random.PRNGKey(7)}

    def pspnet_fwd(c, i):
        emb_map = densefusion.PSPNet(dtype=jnp.bfloat16).apply(
            {"params": pose_vars["params"]["PSPNet_0"]}, img + c)
        return (emb_map.sum() * 0).astype(jnp.float32), emb_map[0, 0, 0, 0]
    emit("train_pspnet_fwd_bs8", scan_time(pspnet_fwd, jnp.float32(0)))

    def pspnet_fwd_s2b(c, i):
        emb_map = densefusion.PSPNet(dtype=jnp.bfloat16, dil_s2b=True).apply(
            {"params": pose_vars["params"]["PSPNet_0"]}, img + c)
        return (emb_map.sum() * 0).astype(jnp.float32), emb_map[0, 0, 0, 0]
    emit("train_pspnet_fwd_bs8_dils2b",
         scan_time(pspnet_fwd_s2b, jnp.float32(0)))

    def posenet_fwd(c, i):
        pr, pt, pc, emb = posenet.apply(pose_vars, img + c, cloud, choose,
                                        obj_idx)
        return (pr.sum() * 0).astype(jnp.float32), pt[0, 0]
    emit("train_posenet_fwd_bs8", scan_time(posenet_fwd, jnp.float32(0)))

    pr0, pt0, pc0, _ = jax.block_until_ready(
        posenet.apply(pose_vars, img, cloud, choose, obj_idx))

    def symloss_fwd(c, i):
        out = losses.pose_loss(pr0 + c, pt0, pc0, target, model_points,
                               cloud, is_sym, w=0.015, with_sym=True)
        return (out.loss * 0).astype(jnp.float32), out.loss
    emit("train_symloss_fwd_bs8", scan_time(symloss_fwd, jnp.float32(0)))

    def symloss_bwd(c, i):
        def f(pr, pt, pc, cl):
            out = losses.pose_loss(pr, pt, pc, target, model_points, cl,
                                   is_sym, w=0.015, with_sym=True)
            return out.loss
        g = jax.grad(f, argnums=(0, 1, 2, 3))(pr0 + c, pt0, pc0, cloud)
        return (g[0].sum() * 0).astype(jnp.float32), g[0][0, 0, 0]
    emit("train_symloss_fwd_bwd_bs8", scan_time(symloss_bwd, jnp.float32(0)))

    tx = dft.make_optimizer(1e-4)
    opt_state = tx.init(pose_vars["params"])

    def est_step(carry, i):
        pv, os_ = carry
        b = dict(batch)
        b["dropout_rng"] = jax.random.fold_in(jax.random.PRNGKey(7), i)
        pv, os_, metrics = dft.estimator_step(pv, os_, b, 0.015, posenet, tx)
        return (pv, os_), metrics["loss"]
    emit("train_estimator_step_bs8",
         scan_time(est_step, (pose_vars, opt_state), iters=8))

    def est_step_bf16(carry, i):
        pv, os_ = carry
        b = dict(batch)
        b["dropout_rng"] = jax.random.fold_in(jax.random.PRNGKey(7), i)
        pv, os_, metrics = dft.estimator_step(pv, os_, b, 0.015, posenet, tx,
                                              True, True)
        return (pv, os_), metrics["loss"]
    emit("train_estimator_step_bs8_symbf16",
         scan_time(est_step_bf16, (pose_vars, opt_state), iters=8))

    # space-to-batch dilated blocks: exact rewrite, same pose_vars (the
    # param tree is dilation-independent) — pure lowering A/B
    posenet_s2b = densefusion.PoseNet(num_obj=num_obj, dtype=jnp.bfloat16,
                                      dil_s2b=True)

    def est_step_s2b(carry, i):
        pv, os_ = carry
        b = dict(batch)
        b["dropout_rng"] = jax.random.fold_in(jax.random.PRNGKey(7), i)
        pv, os_, metrics = dft.estimator_step(pv, os_, b, 0.015, posenet_s2b,
                                              tx)
        return (pv, os_), metrics["loss"]
    emit("train_estimator_step_bs8_dils2b",
         scan_time(est_step_s2b, (pose_vars, opt_state), iters=8))

    txr = dft.make_optimizer(1e-4)
    opt_r = txr.init(refine_vars["params"])

    def ref_step(carry, i):
        rv, os_ = carry
        rv, os_, metrics = dft.refiner_step(pose_vars, rv, os_, batch, 0.015,
                                            posenet, refiner, txr)
        return (rv, os_), metrics["dis"]
    emit("train_refiner_step_bs8",
         scan_time(ref_step, (refine_vars, opt_r), iters=8))


def main():
    t0 = time.perf_counter()
    x = jnp.ones((1024, 1024))
    _ = np.asarray(x @ x)
    emit("probe_matmul_1k", time.perf_counter() - t0)
    if "--train-only" not in sys.argv:
        serving_section()
    if "--serve-only" not in sys.argv:
        train_section()


if __name__ == "__main__":
    main()
