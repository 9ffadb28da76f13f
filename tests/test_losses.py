"""Pose losses vs a direct numpy transcription of the reference formulas, and
segmentation loss/metric tests."""
import jax
import jax.numpy as jnp
import numpy as np

from autoposeestimation_tpu.models import losses
from autoposeestimation_tpu.utils import transforms as T


def ref_loss_numpy(pred_r, pred_t, pred_c, target, model_points, points, w,
                   sym=False):
    """Numpy transcription of loss_calculation
    (/root/reference/DenseFusion/lib/loss.py:12-73), bs=1."""
    num_p = pred_c.shape[0]
    m = model_points.shape[0]
    q = pred_r / np.linalg.norm(pred_r, axis=1, keepdims=True)
    w_, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    base = np.stack([
        1 - 2 * (y ** 2 + z ** 2), 2 * x * y - 2 * w_ * z, 2 * w_ * y + 2 * x * z,
        2 * x * y + 2 * w_ * z, 1 - 2 * (x ** 2 + z ** 2), -2 * w_ * x + 2 * y * z,
        -2 * w_ * y + 2 * x * z, 2 * w_ * x + 2 * y * z, 1 - 2 * (x ** 2 + y ** 2),
    ], axis=1).reshape(num_p, 3, 3)
    pred = np.einsum("mj,nkj->nmk", model_points, base) \
        + (points + pred_t)[:, None, :]
    tgt = np.broadcast_to(target, (num_p, m, 3))
    if sym:
        d2 = (np.sum(pred ** 2, 2)[:, :, None] + np.sum(target ** 2, 1)[None, None]
              - 2 * pred @ target.T)
        per = np.sqrt(np.maximum(d2.min(axis=2), 0))
    else:
        per = np.linalg.norm(pred - tgt, axis=2)
    dis = per.mean(axis=1)
    std = per.std(axis=1, ddof=1)  # torch.std default (lib/loss.py:52)
    loss = np.mean((dis + 2 * std) * pred_c - w * np.log(pred_c))
    which = np.argmax(pred_c)
    t_best = points[which] + pred_t[which]
    new_points = (points - t_best) @ base[which]
    new_target = (target - t_best) @ base[which]
    return loss, dis[which], new_points, new_target


def random_inputs(seed=0, n=50, m=30):
    rng = np.random.default_rng(seed)
    pred_r = rng.normal(size=(n, 4)).astype(np.float32)
    pred_t = (rng.normal(size=(n, 3)) * 0.01).astype(np.float32)
    pred_c = rng.uniform(0.1, 0.9, n).astype(np.float32)
    model_points = (rng.normal(size=(m, 3)) * 0.05).astype(np.float32)
    points = (rng.normal(size=(n, 3)) * 0.1 + [0, 0, 0.8]).astype(np.float32)
    rot = np.asarray(T.quat_to_mat(jnp.asarray(
        rng.normal(size=4).astype(np.float32))))
    target = (model_points @ rot.T + [0.02, -0.01, 0.82]).astype(np.float32)
    return pred_r, pred_t, pred_c, model_points, points, target


def test_pose_loss_matches_reference_formula():
    pred_r, pred_t, pred_c, model_points, points, target = random_inputs()
    want_loss, want_dis, want_np, want_nt = ref_loss_numpy(
        pred_r, pred_t, pred_c, target, model_points, points, w=0.015)
    out = losses.pose_loss(
        pred_r[None], pred_t[None], pred_c[None], target[None],
        model_points[None], points[None], jnp.asarray([False]), w=0.015)
    np.testing.assert_allclose(float(out.loss), want_loss, rtol=1e-4)
    np.testing.assert_allclose(float(out.dis[0]), want_dis, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.new_points[0]), want_np, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.new_target[0]), want_nt, atol=1e-5)


def test_pose_loss_symmetric_matches_reference_formula():
    pred_r, pred_t, pred_c, model_points, points, target = random_inputs(1)
    want_loss, want_dis, _, _ = ref_loss_numpy(
        pred_r, pred_t, pred_c, target, model_points, points, w=0.015, sym=True)
    out = losses.pose_loss(
        pred_r[None], pred_t[None], pred_c[None], target[None],
        model_points[None], points[None], jnp.asarray([True]), w=0.015)
    np.testing.assert_allclose(float(out.loss), want_loss, rtol=1e-4)
    np.testing.assert_allclose(float(out.dis[0]), want_dis, rtol=1e-4)


def test_pose_loss_sym_leq_nonsym():
    pred_r, pred_t, pred_c, model_points, points, target = random_inputs(2)
    args = (pred_r[None], pred_t[None], pred_c[None], target[None],
            model_points[None], points[None])
    dis_ns = float(losses.pose_loss(*args, jnp.asarray([False])).dis[0])
    dis_s = float(losses.pose_loss(*args, jnp.asarray([True])).dis[0])
    assert dis_s <= dis_ns + 1e-6


def test_pose_loss_perfect_prediction_near_zero():
    rng = np.random.default_rng(3)
    m, n = 40, 20
    model_points = (rng.normal(size=(m, 3)) * 0.05).astype(np.float32)
    true_q = np.asarray([0.9, 0.1, -0.2, 0.3], np.float32)
    true_q /= np.linalg.norm(true_q)
    rot = np.asarray(T.quat_to_mat(jnp.asarray(true_q)))
    true_t = np.asarray([0.02, -0.03, 0.8], np.float32)
    target = (model_points @ rot.T + true_t).astype(np.float32)
    points = (rng.normal(size=(n, 3)) * 0.05 + true_t).astype(np.float32)
    pred_r = np.tile(true_q, (n, 1))
    pred_t = (true_t - points).astype(np.float32)
    pred_c = np.full(n, 0.5, np.float32)
    out = losses.pose_loss(pred_r[None], pred_t[None], pred_c[None],
                           target[None], model_points[None], points[None],
                           jnp.asarray([False]))
    assert float(out.dis[0]) < 1e-5


def test_refine_loss_and_rebase_consistency():
    rng = np.random.default_rng(4)
    m, n = 30, 25
    model_points = (rng.normal(size=(m, 3)) * 0.05).astype(np.float32)
    q = np.asarray([0.8, 0.2, 0.1, -0.1], np.float32)
    q /= np.linalg.norm(q)
    rot = np.asarray(T.quat_to_mat(jnp.asarray(q)))
    t = np.asarray([0.01, 0.02, 0.75], np.float32)
    target = (model_points @ rot.T + t).astype(np.float32)
    points = (rng.normal(size=(n, 3)) * 0.1 + t).astype(np.float32)
    mean_dis, dis, new_pts, new_tgt = losses.refine_loss(
        jnp.asarray(q)[None], jnp.asarray(t)[None], target[None],
        model_points[None], points[None], jnp.asarray([False]))
    # prediction == ground truth -> dis == 0, new_target == model_points
    assert float(mean_dis) < 1e-5
    np.testing.assert_allclose(np.asarray(new_tgt[0]), model_points, atol=1e-5)


def test_estimator_prediction_picks_max_conf():
    rng = np.random.default_rng(5)
    n = 10
    pred_r = rng.normal(size=(1, n, 4)).astype(np.float32)
    pred_t = rng.normal(size=(1, n, 3)).astype(np.float32)
    pred_c = np.zeros((1, n, 1), np.float32)
    pred_c[0, 7] = 1.0
    points = rng.normal(size=(1, n, 3)).astype(np.float32)
    quat, trans = losses.estimator_prediction(
        jnp.asarray(pred_r), jnp.asarray(pred_t), jnp.asarray(pred_c),
        jnp.asarray(points))
    want_q = pred_r[0, 7] / np.linalg.norm(pred_r[0, 7])
    np.testing.assert_allclose(np.asarray(quat[0]), want_q, atol=1e-5)
    np.testing.assert_allclose(np.asarray(trans[0]),
                               points[0, 7] + pred_t[0, 7], atol=1e-6)


def test_compose_refined_matches_matrix_compose():
    rng = np.random.default_rng(6)
    q1 = rng.normal(size=(1, 4)).astype(np.float32)
    q2 = rng.normal(size=(1, 4)).astype(np.float32)
    t1 = rng.normal(size=(1, 3)).astype(np.float32)
    t2 = rng.normal(size=(1, 3)).astype(np.float32)
    qf, tf = losses.compose_refined(jnp.asarray(q2), jnp.asarray(t2),
                                    jnp.asarray(T.quat_normalize(jnp.asarray(q1))),
                                    jnp.asarray(t1))
    m1 = np.eye(4); m1[:3, :3] = np.asarray(T.quat_to_mat(jnp.asarray(q1))); m1[:3, 3] = t1[0]
    m2 = np.eye(4); m2[:3, :3] = np.asarray(T.quat_to_mat(jnp.asarray(q2))); m2[:3, 3] = t2[0]
    mf = m1 @ m2
    np.testing.assert_allclose(np.asarray(T.quat_to_mat(qf[0])), mf[:3, :3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(tf[0]), mf[:3, 3], atol=1e-5)


def test_add_metric_zero_for_exact_pose():
    rng = np.random.default_rng(7)
    m = 50
    model_points = (rng.normal(size=(1, m, 3)) * 0.05).astype(np.float32)
    q = jnp.asarray([[1.0, 0, 0, 0]])
    t = jnp.asarray([[0.0, 0, 0.5]])
    target = np.asarray(model_points) + [0, 0, 0.5]
    add = losses.add_metric(q, t, jnp.asarray(target), jnp.asarray(model_points),
                            jnp.asarray([False]))
    assert float(add[0]) < 1e-6


def test_jaccard_loss_perfect_and_random():
    labels = jnp.zeros((2, 16, 16), jnp.int32).at[:, 4:12, 4:12].set(1)
    perfect = jax.nn.one_hot(labels, 3) * 20.0 - 10.0
    l_perfect = float(losses.jaccard_loss(labels, perfect))
    assert l_perfect < 0.01
    rng = np.random.default_rng(8)
    noise = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    assert float(losses.jaccard_loss(labels, noise)) > l_perfect


def test_jaccard_restricted_to_present_classes():
    # class 2 absent: its (zero) IoU must not drag the loss up
    labels = jnp.zeros((1, 8, 8), jnp.int32)
    logits = jax.nn.one_hot(labels, 3) * 20.0 - 10.0
    assert float(losses.jaccard_loss(labels, logits)) < 0.01


def test_iou_from_confusion():
    pred = jnp.asarray([0, 0, 1, 1, 2, 2])
    true = jnp.asarray([0, 0, 1, 2, 2, 2])
    conf = losses.confusion_matrix(pred, true, 3)
    iou, miou = losses.iou_from_confusion(conf)
    np.testing.assert_allclose(float(iou[0]), 1.0)
    np.testing.assert_allclose(float(iou[1]), 0.5)   # tp 1, fp 1, fn 0
    np.testing.assert_allclose(float(iou[2]), 2 / 3)  # tp 2, fp 0, fn 1
    np.testing.assert_allclose(float(miou), (0.5 + 2 / 3) / 2)


def test_estimator_prediction_topk_reduces_noise():
    """Confidence-weighted top-k averaging (beyond-reference option) must (a)
    reduce zero-mean candidate noise vs the argmax pick, (b) be exactly the
    argmax pick at k=1, and (c) handle quaternion sign flips."""
    rng = np.random.default_rng(0)
    b, n = 4, 256
    true_q = np.tile(np.asarray([0.2, -0.4, 0.1, 0.88], np.float32),
                     (b, 1))
    true_q /= np.linalg.norm(true_q, axis=1, keepdims=True)
    true_t = rng.normal(size=(b, 3)).astype(np.float32) * 0.1
    points = rng.normal(size=(b, n, 3)).astype(np.float32) * 0.05
    # per-candidate predictions = truth + zero-mean noise; random sign flips
    noise_q = rng.normal(size=(b, n, 4)).astype(np.float32) * 0.05
    pred_r = (true_q[:, None] + noise_q) * rng.choice(
        [-1.0, 1.0], size=(b, n, 1)).astype(np.float32)
    pred_t = (true_t[:, None] - points
              + rng.normal(size=(b, n, 3)).astype(np.float32) * 0.02)
    pred_c = rng.uniform(0.4, 0.6, size=(b, n)).astype(np.float32)

    q1, t1 = losses.estimator_prediction(pred_r, pred_t, pred_c, points)
    qk, tk = losses.estimator_prediction(pred_r, pred_t, pred_c, points,
                                         topk=64)
    err1 = np.linalg.norm(np.asarray(t1) - true_t, axis=1).mean()
    errk = np.linalg.norm(np.asarray(tk) - true_t, axis=1).mean()
    assert errk < 0.5 * err1, (errk, err1)
    # rotation: |dot| -> 1 means same rotation
    dot1 = np.abs(np.sum(np.asarray(q1) * true_q, axis=1)).mean()
    dotk = np.abs(np.sum(np.asarray(qk) * true_q, axis=1)).mean()
    assert dotk >= dot1 - 1e-6
    # k=1 equals the argmax path exactly
    q1b, t1b = losses.estimator_prediction(pred_r, pred_t, pred_c, points,
                                           topk=1)
    np.testing.assert_allclose(np.asarray(q1b), np.asarray(q1), atol=1e-7)
    np.testing.assert_allclose(np.asarray(t1b), np.asarray(t1), atol=1e-7)
