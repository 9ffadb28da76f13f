"""The live multi-object prediction path — one fused, jit-compiled XLA graph.

Reference: `full_prediction` (/root/reference/pipeline/utils.py:410-641), which
chains GPU segmentation, CPU cv2 CCA, numpy backprojection, and per-class
PoseNet/refiner forwards with host round-trips per object. Here the whole
frame->poses computation is a single compiled program:

  normalize -> U-Net -> softmax/argmax -> per-class best-component CCA (vmap)
  -> fixed crop + choose 1000 + backproject (per class) -> ONE batched PoseNet
  forward over all class slots -> iterative refiner (rebase + compose, the
  eval-path semantics, experiments/eval.py:74-77) -> per-class (quat, trans).

Every class occupies a static slot; `found` masks the inactive ones. The crop
is a static window (default 320, covering the reference's 40-px-quantized
bboxes for tabletop objects); `choose` indices address that window.

Outputs keep the reference's class-keyed dict contract via the host wrapper
`full_prediction`, including the {segmentation, pose_estimation, total}
elapsed-times dict (pipeline/utils.py:413,515,605,637).
"""
from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import densefusion, losses, unet
from ..models.common import normalize_imagenet
from ..ops import cca as cca_ops
from ..ops import projection as proj
from ..utils import transforms as T
from ..utils.timing import StageTimer


class PredictionModels(NamedTuple):
    seg_model: Any
    seg_vars: Any
    posenet: Any
    pose_vars: Any
    refiner: Any
    refine_vars: Any
    classes: tuple            # class names, index 0 = first foreground class
    model_points: jnp.ndarray  # (K, M, 3) per-class model clouds [m]
    num_points: int
    crop: int
    refine_iters: int
    # >1 = confidence-weighted top-k candidate averaging (beyond-reference
    # accuracy option; 1 = the reference's argmax pick)
    agg_topk: int = 1
    # CCA pooling factor for the serving graph (ops/cca.py scale semantics):
    # pooled label propagation with count-weighted (full-res-exact) component
    # stats; same-class components separated by >= 2*cca_scale px are
    # guaranteed to stay distinct (tests/test_cca.py adjacency tests).
    cca_scale: int = 8
    # unrolled label-propagation sweeps on the pooled grid (3 turns of
    # component geometry — tabletop blobs converge in <= 2); bounds the
    # worst case instead of a convergence while_loop (speckle masks from an
    # untrained net otherwise run the loop to its 64-iteration cap)
    cca_sweeps: int = 3
    # PSPNet embedding decoder output stride (models/pspnet.PSPNet).
    # Constructor default 8: the three decoder convs (80^2/160^2/320^2
    # lattices, ~250 of the frame's 530 GFLOP) run at 40^2 with bilinear
    # gather of the chosen pixels — measured 68.8 -> 121.7 fps at the
    # headline geometry. Round-4 ADD-gated verdict (the round-3 gate was
    # translation-only and blind to the failure mode): NON-symmetric
    # classes hold ADD within 2 mm of the stride-1 graph at stride 8, but
    # SYMMETRIC classes regress ~16 mm at any stride > 2, at any resize
    # placement (artifacts/stride_sweep_round4*.json). The product loader
    # get_prediction_models therefore auto-selects 8 or 2 from the
    # dataset's symmetry flags; 8 stays the constructor default for the
    # explicit-args path (bench/tests build non-symmetric scenes).
    # 1 = the reference-exact full-res decoder (opt-out). Weights are
    # stride-interchangeable (identical param tree).
    emb_stride: int = 8
    # resize placement of the reduced-stride decoder (pspnet.PSPNet.
    # resize_late): late = the 2x resizes sit at the LAST decoder stages, so
    # the dominant 1024->256 conv stays on the coarse lattice while the
    # final embedding map (what the chosen-pixel gather samples) comes out
    # finer. Gated by the same trained-demo ADD sweep as emb_stride.
    emb_resize_late: bool = False
    # space-to-batch lowering of the PSPNet's dilated blocks (exact conv
    # relowering, identical param tree — models/resnet.BasicBlockPlain).
    # Same A/B protocol as emb_stride: flipped only on measured evidence.
    dil_s2b: bool = False
    # component-selection rule for the serving CCA (ops/cca.py rules, all
    # reference-derived). The reference's LIVE path scores components by
    # MEAN probability (/root/reference/pipeline/utils.py:459-463); round-5
    # attribution on the trained 5-object demo (n=36 held-out frames,
    # artifacts/serving_attribution_round5.json) showed that rule selecting
    # a small confident FALSE-POSITIVE fragment on another object over the
    # true body in 12/36 frames for one class (component IoU 0.59 vs its
    # own argmax 0.75; served ADD 88 mm vs 13 mm with the true component) —
    # two components at mean prob 0.985 vs 0.99 tie-break to the wrong one.
    # The SUM (probability-mass) rule — the reference's own
    # background_subtraction rule (utils.py:210-216) — picks the true body
    # in every frame, so it is the serving default; "mean_float" restores
    # the reference-exact live-path behavior.
    cca_rule: str = "sum"


def static_tuple(models: "PredictionModels", refine_iters: Optional[int] = None):
    """The hashable static argument for the fused jit graphs. Single source of
    truth — external callers (bench, driver entry, tests) must use this
    instead of hand-rolling the tuple."""
    iters = models.refine_iters if refine_iters is None else refine_iters
    return (models.seg_model, models.posenet, models.refiner,
            len(models.classes), models.num_points, models.crop, iters,
            models.agg_topk, models.cca_scale, models.cca_sweeps,
            models.cca_rule)


def _pack_masks(masks):
    """Bit-pack boolean masks (..., H, W) -> (..., H, W//8) uint8, MSB-first
    (np.unpackbits order). The per-class masks dominate the serving graph's
    D2H bytes (K x H x W bool = ~1.5 MB/frame at 640x480 x 5 classes); the
    packed form is 8x smaller on the wire. Callers only use this when
    W % 8 == 0 (true for every reference resolution)."""
    m = masks.reshape(masks.shape[:-1] + (-1, 8)).astype(jnp.uint32)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint32)
    return (m * weights).sum(-1).astype(jnp.uint8)


def _unpack_masks(packed: np.ndarray) -> np.ndarray:
    """Host inverse of _pack_masks: (..., H, W//8) uint8 -> (..., H, W) bool."""
    return np.unpackbits(packed, axis=-1).astype(bool)


def _segment(seg_model, seg_vars, image):
    """probs/argmax at the seg model's output lattice — full res for the
    exact out_stride=1 build, (ceil(H/s), ceil(W/s)) for the relowered
    serving decoder (unet.UNet.out_stride). Callers read the stride off
    the module and upsample the (much smaller) downstream masks instead."""
    x = normalize_imagenet(image)[None]
    logits = seg_model.apply(seg_vars, x)[0]
    probs = jax.nn.softmax(logits, axis=-1)
    pred_arg = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    return probs, pred_arg


def _upsample_plane(p, s: int, hw):
    """Nearest-upsample the last two axes by s and fit to hw (crop the
    ceil-mode overshoot; zero/False-pad the pathological odd-dim shortfall).
    Exact inverse of the lattice reduction for block-constant planes."""
    if s == 1:
        return p
    p = jnp.repeat(jnp.repeat(p, s, axis=-2), s, axis=-1)
    h, w = hw
    ph, pw = p.shape[-2], p.shape[-1]
    if ph < h or pw < w:
        pad = [(0, 0)] * (p.ndim - 2) + [(0, max(0, h - ph)),
                                         (0, max(0, w - pw))]
        p = jnp.pad(p, pad)
    return p[..., :h, :w]


def _class_mask(score_plane, pred_arg, cls_id, min_count: int = 100,
                cca_scale: int = 1, cca_sweeps: int = 0,
                cca_rule: str = "sum", seg_stride: int = 1,
                full_hw=None):
    """Largest-mean-probability connected component of one class
    (pipeline/utils.py:444-467). cls_id is 1-based (0 = background);
    `score_plane` is that class's (H, W) probability plane — callers slice
    it from the transposed probs ONCE (a per-class take_along_axis on the
    full (H, W, C) tensor is a 1.5M-element pointwise gather that cost more
    than the entire CCA stage; round-3 A/B attribution).

    cca_scale > 1 labels components on a pooled mask (ops/cca.py) — the
    label-propagation sweeps dominate the fused graph's latency at full
    resolution; the found-gate count stays full-res.

    seg_stride > 1: the planes arrive on the relowered decoder's /s lattice
    (unet.UNet.out_stride). The CCA pooling factor shrinks by s so the
    absolute component grid is unchanged, the found-gate count is scaled
    back to full-res pixels, and the selected component mask is
    nearest-upsampled to `full_hw` before return — downstream (crop /
    choose / backproject against the full-res depth) is stride-blind."""
    cls_mask = pred_arg == cls_id
    count = jnp.sum(cls_mask.astype(jnp.int32)) * (seg_stride * seg_stride)
    # the reference scores components by mean(class_id * prob); the class-id
    # factor is constant within a class so plain prob picks the same
    # component. cca_rule="sum" (the serving default, see PredictionModels.
    # cca_rule) replaces the mean with probability MASS — measured on the
    # round-5 attribution to stop small confident false-positive fragments
    # from out-scoring the true body; "mean_float" is reference-exact.
    score = jnp.where(cls_mask, score_plane, 0.0)
    comp, found, converged = cca_ops.best_component_mask(
        cls_mask, score, min_size=0.0, rule=cca_rule,
        scale=max(1, cca_scale // seg_stride),
        fixed_sweeps=cca_sweeps, with_flag=True)
    if seg_stride > 1:
        comp = _upsample_plane(comp, seg_stride, full_hw)
    return comp, found & (count > min_count), converged


@functools.partial(
    jax.jit,
    static_argnames=("models_static",),
)
def _full_prediction_jit(seg_vars, pose_vars, refine_vars,
                         image, depth, intr, depth_scale, key, models_static):
    """models_static: (seg_model, posenet, refiner, num_classes_fg, num_points,
    crop, refine_iters) — hashable module refs + ints."""
    (seg_model, posenet, refiner, k_fg, num_points, crop,
     refine_iters, agg_topk, cca_scale, cca_sweeps,
     cca_rule) = models_static
    # depth may arrive in the camera's raw dtype (uint16) — casting on
    # device instead of the host halves the depth uplink bytes on remote
    # links (serve_stream uploads it as-is)
    depth = depth.astype(jnp.float32)
    seg_stride = getattr(seg_model, "out_stride", 1)

    probs, pred_arg = _segment(seg_model, seg_vars, image)

    cls_ids = jnp.arange(1, k_fg + 1, dtype=jnp.int32)
    # one transpose yields every class's score plane — no per-class gather
    score_planes = jnp.transpose(probs, (2, 0, 1))[1:k_fg + 1]
    masks, found, cca_converged = jax.vmap(
        lambda sp, c: _class_mask(sp, pred_arg, c,
                                  cca_scale=cca_scale,
                                  cca_sweeps=cca_sweeps,
                                  cca_rule=cca_rule,
                                  seg_stride=seg_stride,
                                  full_hw=depth.shape))(score_planes,
                                                        cls_ids)

    keys = jax.random.split(key, k_fg)

    def per_class(mask, k2):
        # dynamic zoom window >= crop: objects larger than the static crop are
        # no longer truncated (round-1 weakness #3); win == crop is an exact
        # identity slice for the common tabletop case
        h_img, w_img = depth.shape
        r0, c0, win = proj.zoom_window_bbox(mask, crop, h_img, w_img)
        cloud, choose, count = proj.backproject_choose_zoom(
            depth, mask, intr, depth_scale, r0, c0, win, crop, num_points, k2)
        img_crop = proj.resample_window(image, r0, c0, win, crop)
        return cloud, choose, count, normalize_imagenet(img_crop)

    clouds, chooses, counts, crops = jax.vmap(per_class)(masks, keys)
    found = found & (counts > 0)

    obj_idx = jnp.arange(k_fg, dtype=jnp.int32)
    pred_r, pred_t, pred_c, emb = posenet.apply(
        pose_vars, crops, clouds, chooses, obj_idx)
    quat, trans = losses.estimator_prediction(pred_r, pred_t, pred_c, clouds,
                                              topk=agg_topk)

    new_points = losses.rebase_points(quat, trans, clouds)
    for _ in range(refine_iters):
        dr, dt = refiner.apply(refine_vars, new_points, emb, obj_idx)
        quat, trans = losses.compose_refined(dr, dt, quat, trans)
        new_points = losses.rebase_points(quat, trans, clouds)

    out = {
        "found": found,
        "masks": masks,
        "quats": quat,
        "positions": trans,
        # argmax keeps the full-res contract for viewers/tests even when
        # the relowered decoder computed it on the /s lattice
        "argmax": _upsample_plane(pred_arg, seg_stride, depth.shape),
        # per-class: False iff the fixed-sweep CCA budget was too small for
        # this frame's component geometry (fragment may have been selected);
        # cheap exact check, see ops/cca.connected_components(with_flag)
        "cca_converged": cca_converged,
    }
    if masks.shape[-1] % 8 == 0:
        # 8x-smaller wire form of the masks; host wrappers fetch this one
        # and unpack (unfetched outputs cost no transfer)
        out["masks_packed"] = _pack_masks(masks)
    return out


@functools.partial(jax.jit, static_argnames=("models_static",))
def _full_prediction_batched_jit(seg_vars, pose_vars, refine_vars, images,
                                 depths, intr, depth_scale, key,
                                 models_static):
    """Batch mode: the fused frame graph over (B, H, W, ...) frames — same
    outputs with a leading batch axis. NOT a vmap of the single-frame graph
    (round-3 version): nesting vmap over frames on top of the per-class vmap
    halved per-frame throughput (~34 vs ~17 ms at 640x480 — the CCA/gather
    stages lost their single-frame layouts). Instead the batch and class
    axes are FUSED into one flat lane axis (B*K):

      * segmentation runs as ONE batched U-Net forward (B, H, W, C),
      * class masks / score planes come from pure batched ops (a broadcast
        compare + one transpose) — no per-frame slicing,
      * CCA and the crop/choose/backproject gathers run under a SINGLE
        one-level vmap over B*K lanes — exactly the single-frame graph's
        vmap structure, just with more lanes (each lane indexes its frame
        from the closed-over batch, a gather XLA serves lazily),
      * PoseNet + refiner run as ONE (B*K)-batch forward — better MXU
        utilization than B separate K-batches.

    Per-lane keys reproduce the single-frame semantics exactly: frame i's
    lanes use split(split(key, B)[i], K), so batched(frame i) equals the
    single-frame graph run with key split(key, B)[i] (pinned by
    tests/test_pipeline.py::test_batched_matches_single_frame).

    Multi-chip serving shards the frame axis over the mesh 'data' axis
    (dryrun_multichip); B*K reshapes keep the leading (sharded) dim a
    multiple of B so SPMD partitioning stays collective-free."""
    (seg_model, posenet, refiner, k_fg, num_points, crop,
     refine_iters, agg_topk, cca_scale, cca_sweeps,
     cca_rule) = models_static
    depths = depths.astype(jnp.float32)  # raw-dtype uplink, device cast
    b, h_img, w_img = depths.shape
    lanes = b * k_fg
    seg_stride = getattr(seg_model, "out_stride", 1)

    x = normalize_imagenet(images)
    logits = seg_model.apply(seg_vars, x)
    probs = jax.nn.softmax(logits, axis=-1)
    pred_arg = jnp.argmax(probs, axis=-1).astype(jnp.int32)  # (B, H/s, W/s)
    h_s, w_s = pred_arg.shape[1], pred_arg.shape[2]

    cls_ids = jnp.arange(1, k_fg + 1, dtype=jnp.int32)
    score_planes = jnp.transpose(probs, (0, 3, 1, 2))[:, 1:k_fg + 1]
    lane_scores = score_planes.reshape(lanes, h_s, w_s)
    lane_cls_masks = (pred_arg[:, None] == cls_ids[None, :, None, None]
                      ).reshape(lanes, h_s, w_s)

    def lane_cca(cls_mask, score):
        count = (jnp.sum(cls_mask.astype(jnp.int32))
                 * (seg_stride * seg_stride))
        comp, found, converged = cca_ops.best_component_mask(
            cls_mask, jnp.where(cls_mask, score, 0.0), min_size=0.0,
            rule=cca_rule, scale=max(1, cca_scale // seg_stride),
            fixed_sweeps=cca_sweeps, with_flag=True)
        if seg_stride > 1:
            comp = _upsample_plane(comp, seg_stride, (h_img, w_img))
        return comp, found & (count > 100), converged

    masks, found, cca_converged = jax.vmap(lane_cca)(lane_cls_masks,
                                                     lane_scores)

    frame_keys = jax.random.split(key, b)
    per_frame_keys = jax.vmap(lambda k: jax.random.split(k, k_fg))(frame_keys)
    lane_keys = per_frame_keys.reshape((lanes,) + per_frame_keys.shape[2:])
    lane_frame = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k_fg)

    def lane_pose_inputs(mask, k2, fi):
        depth = depths[fi]
        image = images[fi]
        r0, c0, win = proj.zoom_window_bbox(mask, crop, h_img, w_img)
        cloud, choose, count = proj.backproject_choose_zoom(
            depth, mask, intr, depth_scale, r0, c0, win, crop, num_points,
            k2)
        img_crop = proj.resample_window(image, r0, c0, win, crop)
        return cloud, choose, count, normalize_imagenet(img_crop)

    clouds, chooses, counts, crops = jax.vmap(lane_pose_inputs)(
        masks, lane_keys, lane_frame)
    found = found & (counts > 0)

    obj_idx = jnp.tile(jnp.arange(k_fg, dtype=jnp.int32), b)
    pred_r, pred_t, pred_c, emb = posenet.apply(
        pose_vars, crops, clouds, chooses, obj_idx)
    quat, trans = losses.estimator_prediction(pred_r, pred_t, pred_c, clouds,
                                              topk=agg_topk)
    new_points = losses.rebase_points(quat, trans, clouds)
    for _ in range(refine_iters):
        dr, dt = refiner.apply(refine_vars, new_points, emb, obj_idx)
        quat, trans = losses.compose_refined(dr, dt, quat, trans)
        new_points = losses.rebase_points(quat, trans, clouds)

    rs = lambda t: t.reshape((b, k_fg) + t.shape[1:])
    out = {
        "found": rs(found),
        "masks": rs(masks),
        "quats": rs(quat),
        "positions": rs(trans),
        "argmax": _upsample_plane(pred_arg, seg_stride, (h_img, w_img)),
        "cca_converged": rs(cca_converged),
    }
    if masks.shape[-1] % 8 == 0:
        out["masks_packed"] = rs(_pack_masks(masks))
    return out


@functools.partial(jax.jit, static_argnames=("models_static",))
def _pose_from_mask_jit(pose_vars, refine_vars, image, depth, mask, intr,
                        depth_scale, key, models_static, cls_idx):
    # cls_idx is a TRACED scalar (it only selects the per-object head row),
    # so per-class attribution sweeps reuse one compilation across classes
    (_, posenet, refiner, _, num_points, crop, refine_iters,
     agg_topk, _cca_scale, _cca_sweeps, _cca_rule) = models_static
    h_img, w_img = depth.shape
    r0, c0, win = proj.zoom_window_bbox(mask, crop, h_img, w_img)
    cloud, choose, count = proj.backproject_choose_zoom(
        depth, mask, intr, depth_scale, r0, c0, win, crop, num_points, key)
    crops = normalize_imagenet(proj.resample_window(image, r0, c0, win, crop))
    obj = jnp.asarray(cls_idx, jnp.int32).reshape(1)
    pred_r, pred_t, pred_c, emb = posenet.apply(
        pose_vars, crops[None], cloud[None], choose[None], obj)
    quat, trans = losses.estimator_prediction(pred_r, pred_t, pred_c,
                                              cloud[None], topk=agg_topk)
    new_points = losses.rebase_points(quat, trans, cloud[None])
    for _ in range(refine_iters):
        dr, dt = refiner.apply(refine_vars, new_points, emb, obj)
        quat, trans = losses.compose_refined(dr, dt, quat, trans)
        new_points = losses.rebase_points(quat, trans, cloud[None])
    return quat[0], trans[0], count


def pose_from_mask(image, depth, meta, models: PredictionModels, mask,
                   cls_name: str, key: Optional[jax.Array] = None,
                   refine_iters: Optional[int] = None):
    """Pose stage only, with an externally supplied mask (bypasses the
    segmentation + CCA front end). Used for per-stage error attribution and
    for callers that already have a mask. Returns {'position', 'rotation'}."""
    intr = meta["intr"]
    intr_vec = intr.as_array() if hasattr(intr, "as_array") else np.asarray(
        [intr["fx"], intr["fy"], intr["ppx"], intr["ppy"]], np.float32)
    if key is None:
        key = jax.random.PRNGKey(0)
    static = static_tuple(models, refine_iters)
    quat, trans, count = _pose_from_mask_jit(
        models.pose_vars, models.refine_vars, jnp.asarray(image),
        jnp.asarray(depth, jnp.float32), jnp.asarray(mask, bool),
        jnp.asarray(intr_vec), jnp.float32(meta["depth_scale"]), key,
        static, models.classes.index(cls_name))
    return {"position": np.asarray(trans), "rotation": np.asarray(quat),
            "count": int(count)}


def build_models(num_classes_fg: int, model_points: np.ndarray,
                 classes, seg_vars=None, pose_vars=None, refine_vars=None,
                 num_points: int = 1000, crop: int = 320,
                 refine_iters: int = 2, dtype=jnp.bfloat16,
                 seed: int = 0, img_hw=(480, 640),
                 agg_topk: int = 1, cca_scale: int = 8,
                 cca_sweeps: int = 3,
                 emb_stride: int = 8,
                 emb_resize_late: bool = False,
                 dil_s2b: bool = False,
                 cca_rule: str = "sum",
                 seg_out_stride: int = 1) -> PredictionModels:
    """Construct (or wrap loaded) model variables into a PredictionModels.

    seg_out_stride > 1 (power of two) relowers the U-Net decoder's last
    blocks onto the /s lattice (unet.UNet.out_stride — identical param
    tree, stride-interchangeable weights); the serving graphs upsample the
    component masks back to full res. ADD-gated like emb_stride before any
    default flips."""
    assert seg_out_stride in (1, 2, 4, 8), seg_out_stride
    seg_model = unet.UNet(classes=num_classes_fg + 1, dtype=dtype,
                          out_stride=seg_out_stride)
    posenet = densefusion.PoseNet(num_obj=num_classes_fg, dtype=dtype,
                                  emb_stride=emb_stride,
                                  emb_resize_late=emb_resize_late,
                                  dil_s2b=dil_s2b)
    refiner = densefusion.PoseRefineNet(num_obj=num_classes_fg, dtype=dtype)
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 3)
    if seg_vars is None:
        seg_vars = seg_model.init(k0, jnp.zeros((1,) + img_hw + (3,)))
    if pose_vars is None:
        pose_vars = posenet.init(
            k1, jnp.zeros((num_classes_fg, crop, crop, 3)),
            jnp.zeros((num_classes_fg, num_points, 3)),
            jnp.zeros((num_classes_fg, num_points), jnp.int32),
            jnp.zeros((num_classes_fg,), jnp.int32))
    if refine_vars is None:
        refine_vars = refiner.init(
            k2, jnp.zeros((num_classes_fg, num_points, 3)),
            jnp.zeros((num_classes_fg, num_points, 32)),
            jnp.zeros((num_classes_fg,), jnp.int32))
    return PredictionModels(
        seg_model, seg_vars, posenet, pose_vars, refiner, refine_vars,
        tuple(classes), jnp.asarray(model_points, jnp.float32),
        num_points, crop, refine_iters, agg_topk, cca_scale, cca_sweeps,
        emb_stride, emb_resize_late, dil_s2b, cca_rule)


def dataset_has_symmetric(root: str, classes) -> bool:
    """True if any class's acquisition meta carries symmetric=1 (the same
    per-sample key data/pose_dataset.PoseDataset reads for the sym loss)."""
    from ..utils import io

    data_root = io.data_dir(root)
    for cls in classes:
        obj_dir = os.path.join(data_root, cls)
        try:
            run = sorted(os.listdir(obj_dir))[0]
            run_dir = os.path.join(obj_dir, run)
            metas = sorted(f for f in os.listdir(run_dir)
                           if f.endswith(".meta.json"))
            meta = io.read_sample_meta(os.path.join(run_dir, metas[0]))
        except (OSError, IndexError):
            continue
        if bool(meta.get("symmetric", 0)):
            return True
    return False


def get_prediction_models(root: str, data_set_name: str,
                          dtype=jnp.bfloat16,
                          emb_stride: Optional[int] = None,
                          seg_out_stride: int = 1) -> PredictionModels:
    """Load classes, per-class model clouds (mm -> m), and trained weights —
    parity with /root/reference/pipeline/utils.py:643-718.

    emb_stride=None auto-selects the embedding-decoder stride from the
    dataset's symmetry flags (the round-4 trained-demo ADD sweeps,
    artifacts/stride_sweep_round4*.json): every non-symmetric class serves
    within 2 mm ADD of the stride-1 graph at stride 8, but symmetric
    classes regress ~16 mm at any stride > 2 (and at ANY resize placement
    — the decoder convs must run on the fine lattice; interpolating a
    coarse map cannot synthesize the high-frequency embedding detail their
    orientation needs). So: no symmetric class -> 8, else 2."""
    from ..utils import io
    from ..train import checkpoints as ckpt

    classes = io.read_lines(os.path.join(
        io.dataset_dir(root, "segmentation", data_set_name), "classes.txt"))
    if emb_stride is None:
        emb_stride = 2 if dataset_has_symmetric(root, classes) else 8
    clouds = []
    max_m = 0
    for cls in classes:
        pts = io.read_xyz(os.path.join(io.pc_dir(root), cls, f"{cls}.xyz")) / 1000.0
        clouds.append(pts)
        max_m = max(max_m, len(pts))
    model_points = np.zeros((len(classes), max_m, 3), np.float32)
    for i, pts in enumerate(clouds):
        # wrap-pad so padded rows are real surface points (ADD stays valid)
        idx = np.arange(max_m) % max(len(pts), 1)
        model_points[i] = pts[idx]

    seg_vars = ckpt.load_checkpoint(os.path.join(
        root, "segmentation", "trained_models", data_set_name,
        "Unet_resnet34.ckpt.npz"))["variables"]
    pose_dir = os.path.join(root, "DenseFusion", "trained_models", data_set_name)
    pose_vars = ckpt.load_checkpoint(
        os.path.join(pose_dir, "pose_model.npz"))["variables"]
    refine_vars = ckpt.load_checkpoint(
        os.path.join(pose_dir, "pose_refine_model.npz"))["variables"]
    return build_models(len(classes), model_points, classes,
                        seg_vars=seg_vars, pose_vars=pose_vars,
                        refine_vars=refine_vars, dtype=dtype,
                        emb_stride=emb_stride,
                        seg_out_stride=seg_out_stride)


def _intr_vec(meta: Dict) -> np.ndarray:
    intr = meta["intr"]
    return (intr.as_array() if hasattr(intr, "as_array") else np.asarray(
        [intr["fx"], intr["fy"], intr["ppx"], intr["ppy"]], np.float32))


def _materialize(out: Dict, models: "PredictionModels",
                 want_masks: bool = True) -> Dict:
    """Host-side conversion of one frame's device outputs into the
    reference's class-keyed prediction dict."""
    found = np.asarray(out["found"])
    quats = np.asarray(out["quats"])
    positions = np.asarray(out["positions"])
    if want_masks:
        # prefer the bit-packed wire form when the graph emitted one
        masks = (_unpack_masks(np.asarray(out["masks_packed"]))
                 if "masks_packed" in out else np.asarray(out["masks"]))
    else:
        masks = None
    cca_conv = np.asarray(out["cca_converged"])
    predictions = {}
    for i, cls in enumerate(models.classes):
        if found[i]:
            predictions[cls] = {
                "position": positions[i],
                "rotation": quats[i],
            }
            if want_masks:
                predictions[cls]["mask"] = masks[i].astype(np.uint8) * 255
    return {"predictions": predictions,
            "cca_converged": {cls: bool(cca_conv[i])
                              for i, cls in enumerate(models.classes)}}


def serve_stream(frames, models: "PredictionModels",
                 in_flight: int = 4, want_masks: bool = True,
                 key: Optional[jax.Array] = None, batch: int = 1):
    """Dispatch-ahead pipelined serving loop (generator).

    The plain `full_prediction` wrapper is strictly
    dispatch -> wait -> readback: every frame pays the full host<->device
    round trip even though JAX dispatch is asynchronous. For a stream of
    frames that serializes H2D, compute, and D2H. This loop keeps up to
    `in_flight` device executions outstanding — frame N+1..N+in_flight are
    dispatched while frame N's outputs travel back — so steady-state
    throughput approaches the device rate, bounded below by link bandwidth,
    not by link latency.

    `batch` > 1 additionally dispatches that many frames per device call
    through the fused batched graph (`_full_prediction_batched_jit`, at
    per-frame compute parity with the single-frame graph since round 4) —
    the per-dispatch RPC cost is then amortized over the whole batch, so
    on high-latency links throughput scales ~batch x on top of the
    dispatch-ahead overlap. Results still come back one frame at a time,
    in order. Frames are grouped only while their intrinsics/depth_scale
    match (a change flushes the open batch); a stream tail shorter than
    `batch` is padded by repeating the last frame (one static graph shape,
    no recompilation) and the padding outputs are dropped. Per-frame key
    semantics: batch j (first frame index f0) uses fold_in(key, f0) and the
    batched graph gives frame i the key split(fold_in(key, f0), B)[i]
    (pinned by tests/test_pipeline.py::test_serve_stream_batched).

    `frames` yields (image, depth, meta) tuples; results come back IN ORDER
    as full_prediction-contract dicts (set want_masks=False to skip the
    per-class mask readback — positions/rotations only — when the downlink
    is the bottleneck; the masks are by far the largest transfer).

    Reference analog: the live loop is a host-driven
    while-True capture->predict->draw cycle
    (/root/reference/main.py:517-530) with no overlap at all.
    """
    import collections

    if key is None:
        key = jax.random.PRNGKey(int(time.time_ns()) % (2 ** 31))
    static = static_tuple(models)
    pending = collections.deque()
    frame_no = 0
    # Per-frame RPC hygiene (each eager device op or device_put through the
    # tunnel is a full ~RTT round-trip — CLAUDE.md): fold the per-frame key
    # on the HOST CPU backend (an eager fold_in on the accelerator was one
    # whole dispatch per frame), and cache the device copies of the
    # stream-constant intr/depth_scale instead of re-uploading them.
    try:
        _cpu = jax.devices("cpu")[0]
    except (RuntimeError, ValueError):
        _cpu = None
    _key_host = jax.device_put(key, _cpu) if _cpu is not None else key
    _intr_cache = {}

    def _cached_small(meta):
        iv = _intr_vec(meta)
        ck = (tuple(np.asarray(iv).tolist()), float(meta["depth_scale"]))
        if ck not in _intr_cache:
            _intr_cache[ck] = (jnp.asarray(iv),
                               jnp.float32(meta["depth_scale"]))
        return _intr_cache[ck]

    base_fetched = ["found", "quats", "positions", "cca_converged"]

    def _fetched(out):
        if not want_masks:
            return base_fetched
        return base_fetched + [
            "masks_packed" if "masks_packed" in out else "masks"]

    def _prefetch(out):
        # start the D2H transfers NOW (non-blocking): by the time this
        # entry reaches the front of the queue its outputs are already on
        # the host, so the blocking np.asarray in materialization doesn't
        # pay a fresh link round-trip per tensor
        for name in _fetched(out):  # only what materialization reads
            try:
                out[name].copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass

    if batch <= 1:
        for image, depth, meta in frames:
            intr_d, scale_d = _cached_small(meta)
            k = jax.random.fold_in(_key_host, frame_no)
            out = _full_prediction_jit(
                models.seg_vars, models.pose_vars, models.refine_vars,
                jnp.asarray(image), jnp.asarray(depth),
                intr_d, scale_d, k, static)
            _prefetch(out)
            pending.append(out)
            frame_no += 1
            if len(pending) > in_flight:
                yield _materialize(pending.popleft(), models, want_masks)
        while pending:
            yield _materialize(pending.popleft(), models, want_masks)
        return

    # --- batched dispatch: `batch` frames per device call ---------------
    open_key = None        # intr/depth_scale cache key of the open batch
    open_frames = []       # [(image, depth)] awaiting dispatch

    def _dispatch(items, ck):
        n_valid = len(items)
        # pad the tail by repeating the last frame: ONE static graph shape
        items = items + [items[-1]] * (batch - n_valid)
        images = np.stack([np.asarray(im) for im, _ in items])
        # keep the camera's raw depth dtype (the graph casts on device)
        depths = np.stack([np.asarray(d) for _, d in items])
        intr_d, scale_d = _intr_cache[ck]
        k = jax.random.fold_in(_key_host, frame_no)
        out = _full_prediction_batched_jit(
            models.seg_vars, models.pose_vars, models.refine_vars,
            jnp.asarray(images), jnp.asarray(depths), intr_d, scale_d, k,
            static)
        _prefetch(out)
        return out, n_valid

    def _materialize_batch(entry):
        out, n_valid = entry
        # one host conversion per array per BATCH, then numpy slicing
        names = _fetched(out)
        host = {name: np.asarray(out[name]) for name in names}
        for i in range(n_valid):
            yield _materialize({name: host[name][i] for name in names},
                               models, want_masks)

    for image, depth, meta in frames:
        intr_d, scale_d = _cached_small(meta)
        iv = _intr_vec(meta)
        ck = (tuple(np.asarray(iv).tolist()), float(meta["depth_scale"]))
        if open_frames and ck != open_key:
            pending.append(_dispatch(open_frames, open_key))
            frame_no += len(open_frames)
            open_frames = []
        open_key = ck
        open_frames.append((image, depth))
        if len(open_frames) == batch:
            pending.append(_dispatch(open_frames, open_key))
            frame_no += batch
            open_frames = []
        if len(pending) > in_flight:
            yield from _materialize_batch(pending.popleft())
    if open_frames:
        pending.append(_dispatch(open_frames, open_key))
    while pending:
        yield from _materialize_batch(pending.popleft())


def full_prediction(image: np.ndarray, depth: np.ndarray, meta: Dict,
                    models: PredictionModels,
                    key: Optional[jax.Array] = None,
                    color_prediction: bool = False,
                    color_dict: Optional[Dict] = None,
                    with_bbox: bool = False) -> Dict:
    """Host wrapper with the reference's output contract:
    {'predictions': {cls: {'mask', 'position', 'rotation'}},
     'elapsed_times': {'segmentation', 'pose_estimation', 'total'}},
    plus 'segmented_prediction'/'pose_prediction' painted overlays when
    `color_prediction` is set (pipeline/utils.py:417-513,576-603).

    `image` uint8 RGB (480, 640, 3); `depth` raw units (H, W); `meta` provides
    `intr` (Intrinsics or dict) and `depth_scale` (to meters).
    """
    timer = StageTimer()
    intr = meta["intr"]
    if key is None:
        key = jax.random.PRNGKey(int(time.time_ns()) % (2 ** 31))

    static = static_tuple(models)
    # the whole frame runs as one fused graph: 'segmentation' times the device
    # execution, 'pose_estimation' the host transfer of the outputs
    with timer.stage("segmentation"):
        out = _full_prediction_jit(
            models.seg_vars, models.pose_vars, models.refine_vars,
            jnp.asarray(image), jnp.asarray(depth),
            jnp.asarray(_intr_vec(meta)), jnp.float32(meta["depth_scale"]),
            key, static)
        found = np.asarray(out["found"])
    with timer.stage("pose_estimation"):
        # per-class CCA sweep-budget convergence (all-True on tabletop
        # scenes; False flags a serpentine component the fixed sweep count
        # could not fully label)
        out_dict = _materialize(out, models)
    if color_prediction:
        from . import visualize as viz
        from ..main import COLOR_DICT

        cd = color_dict or {
            cls: list(COLOR_DICT.values())[i % len(COLOR_DICT)]
            for i, cls in enumerate(models.classes)}
        mp = {cls: np.asarray(models.model_points[i])
              for i, cls in enumerate(models.classes)}
        out_dict.update(viz.paint_prediction(image, out_dict, cd, intr, mp,
                                             with_bbox=with_bbox))
    out_dict["elapsed_times"] = timer.total()
    return out_dict


def get_robot2object(prediction: Dict, controller, end2cam: np.ndarray) -> Dict:
    """Transform camera-frame predictions into the robot frame
    (/root/reference/pipeline/utils.py:381-408 parity; mm/m handling included)."""
    if not prediction["predictions"]:
        return prediction
    pose = controller.get_pose(return_mm=True)
    rv = jnp.asarray([pose["a"], pose["b"], pose["c"]], jnp.float32)
    robot2end = np.asarray(T.make_tf(
        T.rotvec_to_mat(rv), jnp.asarray([pose["x"], pose["y"], pose["z"]])))
    robot2cam = robot2end @ end2cam
    for cls, p in prediction["predictions"].items():
        cam2obj = np.asarray(T.pose_to_tf(
            jnp.asarray(p["rotation"]), jnp.asarray(p["position"]) * 1000.0))
        robot2obj = robot2cam @ cam2obj
        p["position"] = robot2obj[:3, 3] / 1000.0
        p["rotation"] = np.asarray(T.mat_to_quat(jnp.asarray(robot2obj[:3, :3])))
    return prediction
