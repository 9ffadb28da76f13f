"""Full-loop demonstration on the attached TPU: generate a synthetic scanned
dataset, train segmentation + DenseFusion, evaluate ADD(-S), and serve through
the fused pipeline with the trained weights.

Writes demo workspace + results JSON under --out (default /tmp/autopose_demo)
and prints one JSON line per stage result.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# Demo fixture geometry — the single source of truth shared with
# scripts/bench_extra.trained_serving_line (which rebuilds the serving graph
# against the demo's checkpoints and must match these shapes exactly).
DEMO_IMG_HW = (256, 320)
DEMO_FX = 420.0
DEMO_NUM_PT = 500
DEMO_CROP = 128


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/autopose_demo")
    parser.add_argument("--seg-epochs", type=int, default=12)
    # the refiner needs ~25-30 refine-phase epochs to beat the
    # estimator (round-2 CPU study; the reference trains it for
    # hundreds, train.py:396-420)
    parser.add_argument("--pose-epochs", type=int, default=120)
    parser.add_argument("--reuse-seg", action="store_true",
                        help="load the existing segmentation ckpt "
                             "instead of retraining")
    parser.add_argument("--reuse-pose", action="store_true",
                        help="load the existing pose/refine ckpts instead of "
                             "retraining (fast serving-stage iteration)")
    parser.add_argument("--resume-pose", action="store_true",
                        help="continue an interrupted pose training from the "
                             "trainer_resume snapshot (exact optimizer + "
                             "phase state)")
    parser.add_argument("--refine-only", type=int, default=0, metavar="N",
                        help="keep the saved best estimator, retrain ONLY "
                             "the refine phase for N epochs from a fresh "
                             "identity-initialized refiner (fast refiner "
                             "iteration)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (smoke tests; the axon "
                             "TPU plugin ignores JAX_PLATFORMS)")
    parser.add_argument("--artifact", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "demo_results_round3.json"))
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from autoposeestimation_tpu.data import (loader, pose_dataset,
                                             segmentation_dataset)
    from autoposeestimation_tpu.experiments import eval as eval_mod
    from autoposeestimation_tpu.pipeline import predict
    from autoposeestimation_tpu.train import (densefusion as dft,
                                              segmentation as seg)
    from autoposeestimation_tpu.utils import io, synthetic

    root = args.out
    os.makedirs(root, exist_ok=True)
    results = {}

    center = np.asarray([20.0, -10.0, 35.0])
    # round-3 fixture: the round-2 fixture's ~3 mm/px footprint (128x160,
    # fx 140, ring 420 mm) floored ADD near 38 mm — far above the
    # reference's 16/10 mm training margins, so decay/refine never fired by
    # margin (r2 VERDICT weak #3). 256x320 at fx 420 and a 300 mm ring is
    # ~0.7 mm/px: the reference's operating regime becomes reachable with a
    # fixture change only.
    demo_cfg = synthetic.SynthConfig(img_h=DEMO_IMG_HW[0],
                                     img_w=DEMO_IMG_HW[1], fx=DEMO_FX,
                                     fy=DEMO_FX, ring_radius=300.0,
                                     ring_height=280.0, n_viewpoints=48)
    if not io.list_objects(root):
        # 48 viewpoints -> 39 train / 9 test (the round-2 3-sample test set
        # made every eval a coin flip).
        # symmetric=0 + THREE distributed bumps with DISTINCT COLORS: the
        # flat-shaded renderer carries no shading, so a single-color object
        # hides its rotation from the color branch entirely — the first
        # round-3 run plateaued at ADD ~40 mm on a 0.7 mm/px fixture for
        # exactly that reason. Colored features make orientation observable
        # in RGB from every viewpoint (ADD-S on a bare sphere never
        # penalizes translation drift — the round-2 root cause of 1-2 cm
        # "good" ADD next to 5 cm position error).
        synthetic.make_dataset(root, objects=[
            synthetic.SphereObject("ball", center, 35.0, (210, 40, 40),
                                   symmetric=0,
                                   parts=(((25.0, 25.0, 25.0), 16.0,
                                           (40, 200, 60)),
                                          ((-30.0, 5.0, 5.0), 13.0,
                                           (50, 70, 220)),
                                          ((5.0, -30.0, -10.0), 11.0,
                                           (230, 210, 50))))],
            cfg=demo_cfg)

    # --- segmentation training ------------------------------------------
    t0 = time.time()
    seg_ckpt_dir = os.path.join(root, "segmentation", "trained_models",
                                "synth")
    if args.reuse_seg and os.path.exists(
            os.path.join(seg_ckpt_dir, "Unet_resnet34.ckpt.npz")):
        from autoposeestimation_tpu.train import checkpoints as _ckpt
        _out = _ckpt.load_checkpoint(
            os.path.join(seg_ckpt_dir, "Unet_resnet34.ckpt.npz"))
        seg_out = {"variables": _out["variables"],
                   "best_iou": _out["meta"].get("best_iou", -1.0)}
        results["segmentation"] = {"reused": True}
        print(json.dumps({"stage": "segmentation", "reused": True}),
              flush=True)
    else:
        train_ds = segmentation_dataset.SegmentationDataset(
            root, "synth", mode="train", label_mode="gen", output_size=128)
        valid_ds = segmentation_dataset.SegmentationDataset(
            root, "synth", mode="test", label_mode="gen")
        cfg = seg.SegConfig(classes=2, epochs=args.seg_epochs, batch_size=4,
                            lr=3e-3)
        seg_out = seg.segmentation_training(
            lambda: loader.Loader(train_ds, 4, seed=0),
            lambda: loader.Loader(valid_ds, 4, shuffle=False, drop_last=False),
            cfg, out_dir=os.path.join(root, "segmentation", "trained_models",
                                      "synth"),
            dtype=jnp.bfloat16, sample_shape=(128, 128))
        results["segmentation"] = {
            "best_valid_miou": round(seg_out["best_iou"], 4),
            "epochs": args.seg_epochs,
            "seconds": round(time.time() - t0, 1),
        }
        print(json.dumps({"stage": "segmentation", **results["segmentation"]}),
              flush=True)

    # --- DenseFusion training ---------------------------------------------
    # Margin-native two-phase flow (reference train.py:396-420): lr/w decay
    # when best test ADD < 0.016, refine phase when < 0.010 — the r3 fixture
    # makes both margins reachable so the transitions fire BY MARGIN, with
    # an epoch fallback at 2/3 of the budget only as a safety net. On the
    # transition epoch the best estimator checkpoint is reloaded so the
    # frozen estimator the refiner trains against is the one eval will pair
    # it with (round-1 "refiner hurts" defect).
    from autoposeestimation_tpu.train import checkpoints

    t0 = time.time()
    num_pt, num_pt_mesh, crop = DEMO_NUM_PT, DEMO_NUM_PT, DEMO_CROP
    dcfg = dft.DFConfig(batch_size=4, num_points=num_pt,
                        num_points_mesh=num_pt_mesh, lr=1e-4,
                        # 5/6 of the budget ≈ the reference's ratio (400 of
                        # nepoch 500); it must trail the decay fallback (2/3)
                        # by enough epochs for the refine MARGIN to fire
                        # first — at 2/3 both fallbacks could collide 4
                        # epochs after a late margin decay
                        refine_epoch_margin=(5 * args.pose_epochs) // 6,
                        with_sym=False)
    state = dft.create_trainer(num_obj=1, cfg=dcfg, crop=crop,
                               dtype=jnp.bfloat16)
    ptrain = pose_dataset.PoseDataset(root, "synth", mode="train",
                                      num_pt=num_pt, num_pt_mesh=num_pt_mesh,
                                      crop=crop, add_noise=True,
                                      noise_trans=0.01, rot_degrees=45.0)
    ptest = pose_dataset.PoseDataset(root, "synth", mode="test",
                                     num_pt=num_pt, num_pt_mesh=num_pt_mesh,
                                     crop=crop)
    pimg = pose_dataset.PoseDataset(root, "synth", mode="test", num_pt=num_pt,
                                    num_pt_mesh=num_pt_mesh, crop=crop,
                                    return_raw=True)
    pose_dir = os.path.join(root, "DenseFusion", "trained_models", "synth")
    transitions = {}

    def _transition_cb(st, epoch, test_mean):
        # one-shot scheduled decay as a plateau fallback ONLY while the
        # margin hasn't fired; it mimics the margin decay exactly (flag set,
        # lr AND w decayed once) so the two paths can never stack
        # (r2 ADVICE finding). At 2/3 of the budget: the margin typically
        # fires around epoch ~62 on this fixture — a half-budget fallback
        # preempted it by 2 epochs, masking the margin-native behavior the
        # demo exists to demonstrate
        if (not st.decay_start and epoch == (2 * args.pose_epochs) // 3):
            st.decay_start = True
            st.lr *= dcfg.lr_rate
            st.w *= dcfg.w_rate
            st.opt_state = dft.set_lr(st.opt_state, st.lr)
            transitions.setdefault("decay", {"epoch": epoch,
                                             "trigger": "fallback_schedule"})
        elif st.decay_start and "decay" not in transitions:
            transitions["decay"] = {"epoch": epoch, "trigger": "margin",
                                    "best_test": round(st.best_test, 5)}
        if st.refine_start and "refine" not in transitions:
            transitions["refine"] = {
                "epoch": epoch,
                "trigger": ("margin" if st.best_test < dcfg.refine_margin
                            else "epoch_fallback"),
                "best_test": round(st.best_test, 5)}
            # train the refiner against the BEST estimator
            best = checkpoints.load_checkpoint(
                os.path.join(pose_dir, "pose_model.npz"), st.pose_vars)
            st.pose_vars = jax.tree_util.tree_map(jnp.asarray,
                                                  best["variables"])

    train_kw = dict(
        out_dir=pose_dir,
        image_dump_dir=os.path.join(pose_dir, "logs", "images"),
        image_batches=lambda: loader.Loader(pimg, 4, shuffle=False,
                                            drop_last=False),
        image_every=10, epoch_callback=_transition_cb)
    tb = lambda: loader.Loader(ptrain, 4, seed=0)
    vb = lambda: loader.Loader(ptest, 4, shuffle=False, drop_last=False)

    if args.refine_only and os.path.exists(
            os.path.join(pose_dir, "pose_model.npz")):
        # keep the trained estimator, retrain ONLY the refine phase from a
        # fresh identity-initialized refiner (post-decay lr/w, exactly the
        # state the margin transition would have left)
        best_est = checkpoints.load_checkpoint(
            os.path.join(pose_dir, "pose_model.npz"), state.pose_vars)
        state.pose_vars = jax.tree_util.tree_map(jnp.asarray,
                                                 best_est["variables"])
        state.best_test = float(best_est["meta"]["test_dis"])
        state.decay_start = True
        state.lr = dcfg.lr * dcfg.lr_rate
        state.w = dcfg.w * dcfg.w_rate
        state.refine_start = True
        state.refine_tx = dft.make_optimizer(state.lr)
        state.refine_opt_state = state.refine_tx.init(
            state.refine_vars["params"])
        for stale in ("pose_refine_model", "trainer_resume"):
            for suffix in (".npz", ".npz.meta.json"):
                p = os.path.join(pose_dir, stale + suffix)
                if os.path.exists(p):
                    os.remove(p)
        transitions["decay"] = {"trigger": "carried_from_full_run"}
        transitions["refine"] = {"trigger": "carried_from_full_run",
                                 "best_test": round(state.best_test, 5)}
        # train() iterates range(start_epoch=1, epochs) — exclusive, like
        # every other call site's pose_epochs + 1
        state = dft.train(state, tb, vb, epochs=args.refine_only + 1,
                          **{**train_kw, "save_resume": False})
    elif args.reuse_pose and os.path.exists(
            os.path.join(pose_dir, "pose_model.npz")):
        best_est = checkpoints.load_checkpoint(
            os.path.join(pose_dir, "pose_model.npz"), state.pose_vars)
        state.pose_vars = jax.tree_util.tree_map(jnp.asarray,
                                                 best_est["variables"])
        state.best_test = float(best_est["meta"]["test_dis"])
        state.refine_start = True
    elif args.resume_pose and os.path.exists(
            os.path.join(pose_dir, "trainer_resume.npz")):
        state = dft.resume_trainer(state, pose_dir)
        results["pose_resumed_from_epoch"] = state.cfg.start_epoch
        state = dft.train(state, tb, vb, epochs=args.pose_epochs + 1,
                          **train_kw)
        best_est = checkpoints.load_checkpoint(
            os.path.join(pose_dir, "pose_model.npz"), state.pose_vars)
        state.pose_vars = jax.tree_util.tree_map(jnp.asarray,
                                                 best_est["variables"])
    else:
        for stale in ("pose_model", "pose_refine_model", "trainer_resume"):
            for suffix in (".npz", ".npz.meta.json"):
                path = os.path.join(pose_dir, stale + suffix)
                if os.path.exists(path):
                    os.remove(path)
        state = dft.train(state, tb, vb, epochs=args.pose_epochs + 1,
                          **train_kw)
        best_est = checkpoints.load_checkpoint(
            os.path.join(pose_dir, "pose_model.npz"), state.pose_vars)
        state.pose_vars = jax.tree_util.tree_map(jnp.asarray,
                                                 best_est["variables"])
    results["pose_training"] = {
        "best_test_add_m": round(state.best_test, 5),
        "estimator_best_add_m": round(float(best_est["meta"]["test_dis"]), 5),
        "refine_phase_reached": state.refine_start,
        "transitions": transitions,
        "epochs": args.pose_epochs,
        "seconds": round(time.time() - t0, 1),
    }
    print(json.dumps({"stage": "pose_training", **results["pose_training"]}),
          flush=True)

    # --- ADD(-S) eval on the BEST checkpoints (the reference eval loads
    # pose_model.pth + pose_refine_model.pth, experiments/eval.py:15) ------
    state.pose_vars = jax.tree_util.tree_map(jnp.asarray,
                                             best_est["variables"])
    refine_path = os.path.join(pose_dir, "pose_refine_model.npz")
    refine_saved = os.path.exists(refine_path)
    if refine_saved:
        state.refine_vars = jax.tree_util.tree_map(
            jnp.asarray, checkpoints.load_checkpoint(
                refine_path, state.refine_vars)["variables"])
    add_est = eval_mod.evaluate(
        state, lambda: loader.Loader(ptest, 4, shuffle=False,
                                     drop_last=False),
        ["ball"], refine=False)
    add_ref = add_est
    if refine_saved:
        add_ref = eval_mod.evaluate(
            state, lambda: loader.Loader(ptest, 4, shuffle=False,
                                         drop_last=False),
            ["ball"], refine=True, iteration=dcfg.iteration)
    # choose by translation error: ADD-S on the near-spherical demo object
    # absorbs translation error, and translation is what the grasp needs
    # (<2 cm, grasping_utils.py:7-25); fall back to ADD(-S) when t_err
    # is unavailable
    te_est, te_ref = add_est["ball"]["t_err"], add_ref["ball"]["t_err"]
    if refine_saved and np.isfinite(te_est) and np.isfinite(te_ref):
        use_refine = te_ref <= te_est
    else:
        use_refine = (refine_saved
                      and add_ref["ball"]["dis"] <= add_est["ball"]["dis"])
    results["eval"] = {"estimator_only": add_est, "with_refine": add_ref,
                       "use_refine": use_refine}
    print(json.dumps({"stage": "eval",
                      "estimator_add_m": add_est["ball"]["dis"],
                      "refined_add_m": add_ref["ball"]["dis"],
                      "estimator_t_err_m": te_est,
                      "refined_t_err_m": te_ref,
                      "p_lt_2cm": add_est["ball"]["p"],
                      "use_refine": use_refine}), flush=True)

    # --- trained serving over the FULL test split ---------------------------
    # round-2 defect: a single hand-picked frame made the serving number a
    # lottery ticket; measure position error on every held-out viewpoint
    model_cloud = io.read_xyz(os.path.join(io.pc_dir(root), "ball",
                                           "ball.xyz")) / 1000.0
    models = predict.build_models(
        num_classes_fg=1, model_points=model_cloud[None, :num_pt_mesh],
        classes=("ball",), seg_vars=seg_out["variables"],
        pose_vars=state.pose_vars, refine_vars=state.refine_vars,
        num_points=num_pt, crop=crop,
        refine_iters=dcfg.iteration if use_refine else 0,
        dtype=jnp.bfloat16, img_hw=(demo_cfg.img_h, demo_cfg.img_w))
    ds_dir = io.dataset_dir(root, "pose_estimation", "synth")
    test_stems = io.read_lines(os.path.join(ds_dir, "test_data_list.txt"))
    frames = []
    for stem in test_stems:
        s_meta = io.read_sample_meta(os.path.join(
            io.data_dir(root), stem + ".meta.json"))
        s_image = io.read_color(os.path.join(
            io.data_dir(root), stem + ".color.png"))
        s_depth = io.read_depth(os.path.join(
            io.data_dir(root), stem + ".depth.png")).astype(np.float32)
        s_out = predict.full_prediction(s_image, s_depth, s_meta, models,
                                        key=jax.random.PRNGKey(0))
        robot2cam = io.robot2cam_from_meta(s_meta)
        gt_cam = (np.linalg.inv(robot2cam)
                  @ np.append(center, 1.0))[:3] / 1000.0
        if "ball" in s_out["predictions"]:
            p = s_out["predictions"]["ball"]
            frames.append({"stem": stem, "found": True,
                           "err": float(np.linalg.norm(
                               p["position"] - gt_cam)),
                           "image": s_image, "depth": s_depth,
                           "meta": s_meta, "gt_cam": gt_cam, "pred": p,
                           "robot2cam": robot2cam})
        else:
            frames.append({"stem": stem, "found": False})
    found_frames = [f for f in frames if f["found"]]
    errs = [f["err"] for f in found_frames]
    found = bool(found_frames)
    err = float(np.mean(errs)) if errs else None
    attribution = {}

    # A/B the confidence-weighted top-k candidate aggregation (beyond-
    # reference option) on the same test split via pose_from_mask with the
    # predicted masks — records whether topk>1 is worth enabling
    if found:
        topk_ab = {}
        for k in (1, 4, 16):
            mk = models._replace(agg_topk=k)
            es = []
            for f in found_frames:
                p = predict.pose_from_mask(
                    f["image"], f["depth"], f["meta"], mk,
                    f["pred"]["mask"] > 0, "ball",
                    refine_iters=dcfg.iteration if use_refine else 0)
                es.append(float(np.linalg.norm(p["position"] - f["gt_cam"])))
            topk_ab[f"topk_{k}"] = round(float(np.mean(es)), 5)
        attribution["agg_topk_pos_err_mean_m"] = topk_ab

        # quantify point-draw sampling noise: averaging the pose over 4
        # independent point draws vs a single draw
        es1, es4 = [], []
        for f in found_frames:
            ps = [predict.pose_from_mask(
                f["image"], f["depth"], f["meta"], models,
                f["pred"]["mask"] > 0, "ball", key=jax.random.PRNGKey(k),
                refine_iters=dcfg.iteration if use_refine else 0)["position"]
                for k in range(4)]
            es1.append(float(np.linalg.norm(ps[0] - f["gt_cam"])))
            es4.append(float(np.linalg.norm(
                np.mean(ps, axis=0) - f["gt_cam"])))
        attribution["single_draw_pos_err_mean_m"] = round(
            float(np.mean(es1)), 5)
        attribution["multi_draw4_pos_err_mean_m"] = round(
            float(np.mean(es4)), 5)

        # emb_stride=8 accuracy gate (r2 VERDICT task 1c): the stride-8
        # decoder is now the SERVING DEFAULT (pipeline/predict), so `models`
        # above (and es1) already measure it; the gate re-serves the SAME
        # trained weights through the reference-exact full-res decoder
        # (emb_stride=1) and requires the default to stay within 2 mm of it
        m_exact = predict.build_models(
            num_classes_fg=1, model_points=models.model_points,
            classes=("ball",), seg_vars=seg_out["variables"],
            pose_vars=state.pose_vars, refine_vars=state.refine_vars,
            num_points=num_pt, crop=crop,
            refine_iters=dcfg.iteration if use_refine else 0,
            dtype=jnp.bfloat16, img_hw=(demo_cfg.img_h, demo_cfg.img_w),
            emb_stride=1)
        es_exact = []
        for f in found_frames:
            pe = predict.pose_from_mask(
                f["image"], f["depth"], f["meta"], m_exact,
                f["pred"]["mask"] > 0, "ball",
                refine_iters=dcfg.iteration if use_refine else 0)
            es_exact.append(float(np.linalg.norm(
                pe["position"] - f["gt_cam"])))
        attribution["emb_stride1_exact_pos_err_mean_m"] = round(
            float(np.mean(es_exact)), 5)
        attribution["emb_stride8_pos_err_mean_m"] = round(
            float(np.mean(es1)), 5)
        attribution["emb_stride8_within_2mm"] = bool(
            abs(np.mean(es1) - np.mean(es_exact)) <= 0.002)
    if found:
        attribution["n_test_frames"] = len(frames)
        attribution["n_found"] = len(found_frames)
        attribution["pos_err_mean_m"] = round(float(np.mean(errs)), 5)
        attribution["pos_err_median_m"] = round(float(np.median(errs)), 5)
        attribution["pos_err_max_m"] = round(float(np.max(errs)), 5)
        attribution["pos_err_per_frame"] = {
            f["stem"]: round(f["err"], 5) for f in found_frames}

        # ---- per-stage attribution on the WORST frame ---------------------
        from autoposeestimation_tpu.utils import transforms as T

        worst = max(found_frames, key=lambda f: f["err"])
        attribution["worst_frame"] = worst["stem"]
        image, depth, meta = worst["image"], worst["depth"], worst["meta"]
        gt_cam, pred, robot2cam = (worst["gt_cam"], worst["pred"],
                                   worst["robot2cam"])
        gt_label = io.read_label(os.path.join(
            io.label_dir(root), worst["stem"] + ".gen.label.png")) > 0
        pm = pred["mask"] > 0
        inter = float((pm & gt_label).sum())
        union = float((pm | gt_label).sum())
        attribution["seg_mask_iou"] = round(inter / max(union, 1.0), 4)

        def cam_err(p):
            return float(np.linalg.norm(p["position"] - gt_cam))

        # pose from the GT mask vs the predicted mask, estimator vs refined
        for tag, mask_arr in (("pred_mask", pm), ("gt_mask", gt_label)):
            est = predict.pose_from_mask(image, depth, meta, models, mask_arr,
                                         "ball", refine_iters=0)
            ref = predict.pose_from_mask(image, depth, meta, models, mask_arr,
                                         "ball",
                                         refine_iters=dcfg.iteration)
            attribution[f"cam_err_{tag}_estimator"] = round(cam_err(est), 5)
            attribution[f"cam_err_{tag}_refined"] = round(cam_err(ref), 5)

        # robot-frame composition check: with exact calibration transforms
        # the position-error NORM is invariant under the rigid robot2cam, so
        # robot_frame_err == cam_frame_err proves the frame composition adds
        # nothing (any difference would mean a transform bug)
        cam2obj = np.asarray(T.pose_to_tf(
            jnp.asarray(pred["rotation"]),
            jnp.asarray(pred["position"]) * 1000.0))
        robot2obj = robot2cam @ cam2obj
        robot_err = float(np.linalg.norm(
            robot2obj[:3, 3] / 1000.0 - center / 1000.0))
        attribution["robot_frame_err_m"] = round(robot_err, 5)
        attribution["cam_frame_err_m"] = round(worst["err"], 5)
        attribution["frame_composition_exact"] = bool(
            abs(robot_err - worst["err"]) < 1e-6)
    # NOTE: the host loop blocks on the tunneled chip every frame, so this
    # measures tunnel round-trip latency, not device throughput (bench.py
    # pipelines dispatches and measures the device).
    ff = found_frames[0] if found_frames else None
    t0 = time.time()
    n = 30
    for i in range(n):
        if ff is not None:
            predict.full_prediction(ff["image"], ff["depth"], ff["meta"],
                                    models, key=jax.random.PRNGKey(i))
    fps = n / (time.time() - t0)
    results["serving"] = {"object_found": found,
                          "position_error_m": err,
                          "attribution": attribution,
                          "fps_host_loop_tunnel_bound": round(fps, 1)}
    print(json.dumps({"stage": "serving", **results["serving"]}), flush=True)

    io.write_json(os.path.join(root, "demo_results.json"), results)
    if args.artifact:
        os.makedirs(os.path.dirname(args.artifact), exist_ok=True)
        io.write_json(args.artifact, results)


if __name__ == "__main__":
    main()
