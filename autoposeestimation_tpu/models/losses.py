"""Losses and metrics: DenseFusion ADD(-S) losses, jaccard/IoU segmentation
losses, and the pose-extraction helpers.

Pose losses are behavior-parity with /root/reference/DenseFusion/lib/loss.py and
lib/loss_refiner.py, rebuilt batched:
  * per-point candidate poses: quat -> R, pred = model_points @ R^T + (point + t),
  * symmetric objects use nearest-target matching; since only the distances
    feed the loss, the KNN gather collapses into a chunked min-reduction
    (||a||^2+||b||^2-2ab over the MXU, min over targets) — no 10^9-element
    index materialization like the reference's CUDA KNN path,
  * loss = mean((dis + 2*std) * c - w*log(c)) (loss.py:53),
  * returns the refiner inputs (new_points/new_target) rebased by the
    max-confidence candidate, stop-gradiented.

Segmentation: soft-jaccard restricted to the classes present in the batch
(segmentation/utils.py:71-114) and confusion-matrix IoU excluding background
(utils.py:217-296).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import transforms as T

_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# DenseFusion pose losses
# ---------------------------------------------------------------------------

class PoseLossOut(NamedTuple):
    loss: jnp.ndarray        # scalar
    dis: jnp.ndarray         # (B,) best-candidate ADD(-S) distance
    new_points: jnp.ndarray  # (B, N, 3) rebased cloud for the refiner
    new_target: jnp.ndarray  # (B, M, 3) rebased target for the refiner
    best_r: jnp.ndarray      # (B, 4) max-confidence quaternion
    best_t: jnp.ndarray      # (B, 3) max-confidence translation (point + t)


def _candidate_preds(pred_r, pred_t, points, model_points):
    """Per-candidate transformed model points: (N, M, 3)."""
    rot = T.quat_to_mat(pred_r)  # (N, 3, 3) — normalizes internally
    pred = jnp.einsum("mj,nij->nmi", model_points, rot, precision=_HI)
    return pred + (points + pred_t)[:, None, :]


def _pose_loss_single(pred_r, pred_t, pred_c, target, model_points, points,
                      w, is_sym, refine: bool, with_sym: bool,
                      sym_bf16: bool = False):
    """One sample. pred_r (N,4), pred_t (N,3), pred_c (N,), target (M,3),
    model_points (M,3), points (N,3)."""
    pred = _candidate_preds(pred_r, pred_t, points, model_points)  # (N, M, 3)

    per_point = jnp.linalg.norm(pred - target[None, :, :], axis=2)  # (N, M)
    dis = jnp.mean(per_point, axis=1)  # (N,)
    # sample std (ddof=1): the reference's torch.std default (lib/loss.py:52)
    std = jnp.std(per_point, axis=1, ddof=1)   # (N,)
    if with_sym and not refine:
        # fused matched-moments kernel (Pallas on TPU, chunked XLA elsewhere)
        from ..ops import pallas_addloss

        dis_s, std_s = pallas_addloss.sym_moments(
            pred_r, pred_t, points, model_points, target,
            "bf16" if sym_bf16 else True)
        dis = jnp.where(is_sym, dis_s, dis)
        std = jnp.where(is_sym, std_s, std)
    loss = jnp.mean((dis + 2.0 * std) * pred_c - w * jnp.log(
        jnp.maximum(pred_c, 1e-12)))

    which = jnp.argmax(pred_c)
    best_r = T.quat_normalize(pred_r[which])
    best_t = points[which] + pred_t[which]
    rot = T.quat_to_mat(best_r)  # (3, 3)

    # rebase into the predicted frame: x' = R^T... reference computes
    # (points - t) @ ori_base where ori_base = R (row-vector convention), i.e.
    # x' = R^T (x - t) in column convention
    new_points = jnp.dot(points - best_t, rot, precision=_HI)
    new_target = jnp.dot(target - best_t, rot, precision=_HI)
    return (loss, dis[which], jax.lax.stop_gradient(new_points),
            jax.lax.stop_gradient(new_target), best_r, best_t)


@functools.partial(jax.jit, static_argnames=("refine", "with_sym",
                                             "sym_bf16"))
def pose_loss(pred_r, pred_t, pred_c, target, model_points, points,
              is_sym, w: float = 0.015, refine: bool = False,
              with_sym: bool = True, sym_bf16: bool = False) -> PoseLossOut:
    """Batched DenseFusion estimator loss (lib/loss.py parity).

    Shapes: pred_r (B,N,4), pred_t (B,N,3), pred_c (B,N,1) or (B,N),
    target/model_points (B,M,3), points (B,N,3), is_sym (B,) bool.
    `with_sym=False` skips compiling the symmetric branch entirely (datasets
    without symmetric objects).
    """
    if pred_c.ndim == 3:
        pred_c = pred_c[..., 0]
    f = jax.vmap(functools.partial(_pose_loss_single, refine=refine,
                                   with_sym=with_sym, sym_bf16=sym_bf16),
                 in_axes=(0, 0, 0, 0, 0, 0, None, 0))
    loss, dis, new_points, new_target, best_r, best_t = f(
        pred_r, pred_t, pred_c, target, model_points, points,
        jnp.float32(w), is_sym)
    return PoseLossOut(jnp.mean(loss), dis, new_points, new_target,
                       best_r, best_t)


def _refine_loss_single(pred_r, pred_t, target, model_points, points,
                        is_sym, with_sym: bool):
    """One sample refiner loss (lib/loss_refiner.py parity). pred_r (4,),
    pred_t (3,) — a single global correction.

    Numerical hardening (round-4 discovery, the refine-phase twin of the
    train-kernel fix): this loss IS differentiated, and near convergence
    matched distances go to ~0 — `sqrt` at 0 has an infinite gradient, and
    the expansion-form d2 (‖p‖²+‖t‖²−2p·t, needed for the MXU matmul)
    cancels to exactly 0 (or negative) in f32 well before the true
    distance does. A 120-epoch sym run NaN'd 12 epochs into the refine
    phase from exactly this. Fix: the expansion form only picks the argmin
    (integer, no gradient); the matched distance is recomputed in DIRECT
    form with a 1e-12 eps inside the sqrt — gradient magnitude is then
    globally bounded by ‖d‖/sqrt(‖d‖²+eps²) < 1, and the 1 µm bias is
    negligible against millimeter-scale distances."""
    rot = T.quat_to_mat(pred_r)
    pred = jnp.dot(model_points, rot.T, precision=_HI) + pred_t  # (M, 3)
    diff = pred - target
    per_point = jnp.sqrt(jnp.sum(diff * diff, axis=1) + 1e-12)
    if with_sym:
        tt = jnp.sum(target * target, axis=1)
        pp = jnp.sum(pred * pred, axis=1, keepdims=True)
        d2 = pp + tt[None, :] - 2.0 * jnp.dot(pred, target.T, precision=_HI)
        matched = target[jnp.argmin(d2, axis=1)]          # (M, 3)
        sdiff = pred - matched
        sym_pp = jnp.sqrt(jnp.sum(sdiff * sdiff, axis=1) + 1e-12)
        per_point = jnp.where(is_sym, sym_pp, per_point)
    dis = jnp.mean(per_point)
    new_points = jnp.dot(points - pred_t, rot, precision=_HI)
    new_target = jnp.dot(target - pred_t, rot, precision=_HI)
    return (dis, jax.lax.stop_gradient(new_points),
            jax.lax.stop_gradient(new_target))


@functools.partial(jax.jit, static_argnames=("with_sym",))
def refine_loss(pred_r, pred_t, target, model_points, points, is_sym,
                with_sym: bool = True):
    """Batched refiner loss: returns (mean dis, per-sample dis, new_points,
    new_target)."""
    f = jax.vmap(functools.partial(_refine_loss_single, with_sym=with_sym))
    dis, new_points, new_target = f(pred_r, pred_t, target, model_points,
                                    points, is_sym)
    return jnp.mean(dis), dis, new_points, new_target


# ---------------------------------------------------------------------------
# Pose extraction (tools/utils.py parity)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("topk",))
def estimator_prediction(pred_r, pred_t, pred_c, points, topk: int = 1):
    """Max-confidence candidate -> (quat (B,4), trans (B,3))
    (my_estimator_prediction parity, tools/utils.py:7-18).

    topk > 1 is an opt-in improvement beyond the reference: instead of
    trusting the single argmax candidate, average the top-k candidates
    weighted by confidence (quaternions sign-aligned to the best one before
    the chord mean). Zero-mean per-candidate noise shrinks ~1/sqrt(k); the
    reference's single-point pick is the k=1 special case and the default."""
    if pred_c.ndim == 3:
        pred_c = pred_c[..., 0]
    if topk <= 1:
        which = jnp.argmax(pred_c, axis=1)
        take = lambda x: jnp.take_along_axis(
            x, which[:, None, None].astype(jnp.int32).repeat(x.shape[-1], -1),
            axis=1)[:, 0]
        quat = T.quat_normalize(take(pred_r))
        trans = take(points) + take(pred_t)
        return quat, trans
    conf, idx = jax.lax.top_k(pred_c, topk)                    # (B, K)
    gather = lambda x: jnp.take_along_axis(
        x, idx[..., None].astype(jnp.int32), axis=1)           # (B, K, 3|4)
    quats = jax.vmap(jax.vmap(T.quat_normalize))(gather(pred_r))
    # sign-align every candidate to the top-1 quaternion (q and -q are the
    # same rotation; a naive mean would cancel them)
    sign = jnp.sign(jnp.sum(quats * quats[:, :1], axis=-1, keepdims=True))
    quats = quats * jnp.where(sign == 0, 1.0, sign)
    w = conf / jnp.maximum(jnp.sum(conf, axis=1, keepdims=True), 1e-12)
    quat = T.quat_normalize(jnp.sum(quats * w[..., None], axis=1))
    cands_t = gather(points) + gather(pred_t)                  # (B, K, 3)
    trans = jnp.sum(cands_t * w[..., None], axis=1)
    return quat, trans


@jax.jit
def rebase_points(quat, trans, points):
    """get_new_points parity (tools/utils.py:43-86): express the cloud in the
    current pose estimate's frame."""
    rot = T.quat_to_mat(quat)  # (B, 3, 3)
    return jnp.einsum("bni,bij->bnj", points - trans[:, None, :], rot,
                      precision=_HI)


@jax.jit
def compose_refined(delta_r, delta_t, quat, trans):
    """my_refined_prediction parity: current_pose @ delta."""
    return T.compose_quat_poses(quat, trans, T.quat_normalize(delta_r), delta_t)


# ---------------------------------------------------------------------------
# ADD(-S) metric (experiments/eval.py:80-99 definition)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("with_sym",))
def add_metric(quat, trans, target, model_points, is_sym, with_sym: bool = True):
    """Mean point distance between the predicted-pose model points and the
    ground-truth target points; symmetric objects use nearest-point matching."""
    rot = T.quat_to_mat(quat)
    pred = jnp.einsum("bmj,bij->bmi", model_points, rot, precision=_HI) \
        + trans[:, None, :]
    per = jnp.linalg.norm(pred - target, axis=2)
    if with_sym:
        tt = jnp.sum(target * target, axis=2)
        pp = jnp.sum(pred * pred, axis=2)
        d2 = (pp[:, :, None] + tt[:, None, :]
              - 2.0 * jnp.einsum("bmi,bni->bmn", pred, target, precision=_HI))
        sym_per = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=2), 0.0))
        per = jnp.where(is_sym[:, None], sym_per, per)
    return jnp.mean(per, axis=1)


# ---------------------------------------------------------------------------
# Segmentation losses/metrics
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("per_column",))
def jaccard_loss(labels, logits, eps: float = 1e-7,
                 per_column: bool = False):
    """Soft-jaccard loss restricted to classes present in the batch
    (segmentation/utils.py:71-114). labels (B,H,W) int, logits (B,H,W,C).

    per_column=True replicates the reference's EXACT reduction: with (B,H,W)
    labels its `dims = (0,) + range(2, true.ndim)` sums over batch+height
    only, yielding per-(class, image-column) IoUs averaged together — an
    artifact of the ndim-dependent dims (utils.py:104). The default
    (per_column=False) is the intended full-image reduction; training works
    with either, the deviation is deliberate and tested against the
    reference in tests/test_reference_golden.py."""
    c = logits.shape[-1]
    probas = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, c, dtype=probas.dtype)
    # reduction axes over (B, H, W, C) layout: reference torch layout is
    # (B, C, H, W) with dims (0, 2) [per_column] or (0, 2, 3) [full]
    dims = (0, 1) if per_column else (0, 1, 2)
    intersection = jnp.sum(probas * onehot, dims)
    cardinality = jnp.sum(probas + onehot, dims)
    union = cardinality - intersection
    per_class = intersection / (union + eps)  # (W, C) or (C,)
    present = jnp.zeros(c, bool).at[labels.reshape(-1)].set(True)
    if per_column:
        masked = jnp.where(present[None, :], per_class.reshape(-1, c), 0.0)
        w = masked.shape[0]
        mean = jnp.sum(masked) / jnp.maximum(
            jnp.sum(present.astype(per_class.dtype)) * w, 1.0)
    else:
        mean = jnp.sum(jnp.where(present, per_class, 0.0)) / jnp.maximum(
            jnp.sum(present.astype(per_class.dtype)), 1.0)
    return 1.0 - mean


@functools.partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix(pred, labels, num_classes: int):
    """(C, C) confusion matrix, rows = ground truth (utils.py:193-198)."""
    x = pred.reshape(-1) + num_classes * labels.reshape(-1)
    counts = jnp.bincount(x.astype(jnp.int32), length=num_classes ** 2)
    return counts.reshape(num_classes, num_classes)


def iou_from_confusion(conf):
    """(per-class IoU (C,), mIoU over classes 1.. ) — background excluded from
    the mean like the reference (utils.py:296); NaN-free (absent classes
    contribute 0 and are excluded from the mean)."""
    conf = conf.astype(jnp.float32)
    tp = jnp.diag(conf)
    fp = jnp.sum(conf, axis=0) - tp
    fn = jnp.sum(conf, axis=1) - tp
    denom = tp + fp + fn
    iou = jnp.where(denom > 0, tp / jnp.maximum(denom, 1.0), jnp.nan)
    fg = iou[1:]
    valid = ~jnp.isnan(fg)
    miou = jnp.sum(jnp.where(valid, fg, 0.0)) / jnp.maximum(
        jnp.sum(valid.astype(jnp.float32)), 1.0)
    return iou, miou
