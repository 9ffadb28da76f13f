"""Fused symmetric ADD-S moments: pallas-interpret vs XLA vs autodiff."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from autoposeestimation_tpu.ops import pallas_addloss as pa
from autoposeestimation_tpu.utils import transforms as T


def inputs(seed=0, n=40, m=30):
    rng = np.random.default_rng(seed)
    quat = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    trans = jnp.asarray(rng.normal(size=(n, 3)) * 0.01, jnp.float32)
    points = jnp.asarray(rng.normal(size=(n, 3)) * 0.1, jnp.float32)
    model = jnp.asarray(rng.normal(size=(m, 3)) * 0.05, jnp.float32)
    rot = np.asarray(T.quat_to_mat(jnp.asarray(rng.normal(size=4),
                                               jnp.float32)))
    target = jnp.asarray(np.asarray(model) @ rot.T + [0.01, 0.0, 0.02],
                         jnp.float32)
    return quat, trans, points, model, target


def reference_moments(quat, trans, points, model, target):
    rot = T.quat_to_mat(quat)
    pred = jnp.einsum("mj,nij->nmi", model, rot) + (points + trans)[:, None]
    d = jnp.linalg.norm(pred[:, :, None, :] - target[None, None, :, :],
                        axis=-1)
    dmin = jnp.min(d, axis=2)
    # ddof=1: torch.std parity (reference lib/loss.py:52)
    return jnp.mean(dmin, axis=1), jnp.std(dmin, axis=1, ddof=1)


def test_xla_path_matches_direct():
    quat, trans, points, model, target = inputs()
    dis, std = pa.sym_moments(quat, trans, points, model, target,
                              use_pallas=False)
    want_dis, want_std = reference_moments(quat, trans, points, model, target)
    np.testing.assert_allclose(np.asarray(dis), np.asarray(want_dis),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(std), np.asarray(want_std),
                               atol=1e-5)


def test_pallas_interpret_matches():
    quat, trans, points, model, target = inputs(1)
    rot = T.quat_to_mat(quat)
    dis_p, var_p = pa._moments_fwd(rot, points + trans, model, target,
                                   interpret=True)
    want_dis, want_std = reference_moments(quat, trans, points, model, target)
    np.testing.assert_allclose(np.asarray(dis_p), np.asarray(want_dis),
                               atol=1e-5)
    np.testing.assert_allclose(np.sqrt(np.maximum(np.asarray(var_p), 0.0)),
                               np.asarray(want_std), atol=1e-4)


@pytest.mark.slow
def test_custom_vjp_matches_autodiff():
    quat, trans, points, model, target = inputs(2, n=12, m=16)

    def loss_custom(q, t, p):
        dis, std = pa.sym_moments(q, t, p, model, target, False)
        return jnp.sum(dis * 1.3 + std * 0.7)

    def loss_auto(q, t, p):
        dis, std = reference_moments(q, t, p, model, target)
        return jnp.sum(dis * 1.3 + std * 0.7)

    gc = jax.grad(loss_custom, argnums=(0, 1, 2))(quat, trans, points)
    ga = jax.grad(loss_auto, argnums=(0, 1, 2))(quat, trans, points)
    for a, b in zip(gc, ga):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_chunked_paths_match_unchunked(monkeypatch):
    """Forcing tiny chunks (several lax.map iterations) must not change the
    forward moments or the backward grads — the memory-bounding fix for the
    (N, M, M) blow-up is purely a scheduling change."""
    quat, trans, points, model, target = inputs(4, n=23, m=11)

    def loss(q, t, p):
        dis, std = pa.sym_moments(q, t, p, model, target, False)
        return jnp.sum(dis * 1.3 + std * 0.7)

    want = loss(quat, trans, points)
    gwant = jax.grad(loss, argnums=(0, 1, 2))(quat, trans, points)
    monkeypatch.setattr(pa, "_CHUNK_ELEMS", 5 * 11 * 11)  # chunk=5 over n=23
    got = loss(quat, trans, points)
    ggot = jax.grad(loss, argnums=(0, 1, 2))(quat, trans, points)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
    for a, b in zip(ggot, gwant):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_vjp_under_vmap():
    """pose_loss vmaps over the batch; the custom VJP must survive that."""
    quat, trans, points, model, target = inputs(3, n=8, m=10)
    batch_q = jnp.stack([quat, quat * 1.1])
    batch_t = jnp.stack([trans, trans])
    batch_p = jnp.stack([points, points])
    batch_m = jnp.stack([model, model])
    batch_tg = jnp.stack([target, target])

    def loss(q, t, p, m_, tg):
        dis, std = jax.vmap(
            lambda a, b, c, d, e: pa.sym_moments(a, b, c, d, e, False)
        )(q, t, p, m_, tg)
        return jnp.sum(dis + std)

    g = jax.grad(loss)(batch_q, batch_t, batch_p, batch_m, batch_tg)
    assert np.isfinite(np.asarray(g)).all()


def _train_kernel_grads(quat, trans, points, model, target, gd, gs):
    """Run the fused train kernel (interpret) and combine precursors the way
    the VJP wrapper does."""
    from autoposeestimation_tpu.utils import transforms as TT

    rot = TT.quat_to_mat(quat)
    dis, var, a_t, b_t, a_r, b_r = pa._moments_train_pallas(
        rot, points + trans, model, target, interpret=True)
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    g_t = gd[:, None] * a_t + gs[:, None] * b_t
    g_rot = gd[:, None, None] * a_r + gs[:, None, None] * b_r
    g_q = jax.vmap(lambda q, gr: jax.grad(
        lambda qq: jnp.sum(TT.quat_to_mat(qq) * gr))(q))(quat, g_rot)
    return dis, std, g_q, g_t


def test_train_kernel_interpret_matches_autodiff():
    """The fused train kernel (moments + gradient precursors in one pass)
    must reproduce both the forward moments and autodiff gradients."""
    quat, trans, points, model, target = inputs(5, n=70, m=30)
    gd = jnp.asarray(np.random.default_rng(6).normal(size=70), jnp.float32)
    gs = jnp.asarray(np.random.default_rng(7).normal(size=70), jnp.float32)

    dis, std, g_q, g_t = _train_kernel_grads(quat, trans, points, model,
                                             target, gd, gs)
    want_dis, want_std = reference_moments(quat, trans, points, model, target)
    np.testing.assert_allclose(np.asarray(dis), np.asarray(want_dis),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(std), np.asarray(want_std),
                               atol=1e-4)

    def loss_auto(q, t, p):
        d, s = reference_moments(q, t, p, model, target)
        return jnp.sum(d * gd + s * gs)

    ga_q, ga_t, ga_p = jax.grad(loss_auto, argnums=(0, 1, 2))(
        quat, trans, points)
    # atol 5e-4: the kernel's f32 mode computes d2 as bf16x3 (_dot_f32x3,
    # ~1.5e-7 absolute), so a candidate whose two nearest targets are
    # closer than that can match the OTHER one — a discrete argmin
    # tie-flip whose gradient is an equally valid subgradient, observed as
    # a few ~2e-4 element deviations on random clouds
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(ga_t), atol=5e-4)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(ga_p), atol=5e-4)
    np.testing.assert_allclose(np.asarray(g_q), np.asarray(ga_q), atol=5e-4)


def test_train_kernel_interpret_wrap_padded_targets():
    """Wrap-padded model clouds duplicate targets -> exact distance ties; the
    indicator-normalized matching must still give finite, correct grads."""
    quat, trans, points, model, target = inputs(8, n=16, m=12)
    model = jnp.concatenate([model[:6], model[:6]], axis=0)   # duplicates
    target = jnp.concatenate([target[:6], target[:6]], axis=0)
    gd = jnp.ones(16)
    gs = jnp.full(16, 0.3)
    dis, std, g_q, g_t = _train_kernel_grads(quat, trans, points, model,
                                             target, gd, gs)

    def loss_auto(q, t, p):
        d, s = reference_moments(q, t, p, model, target)
        return jnp.sum(d * gd + s * gs)

    _, ga_t, _ = jax.grad(loss_auto, argnums=(0, 1, 2))(quat, trans, points)
    assert np.isfinite(np.asarray(g_t)).all()
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(ga_t), atol=1e-4)


def _sphere_inputs(n=8, m=200, noise=2e-6, seed=5):
    """Near-degenerate case: model/target are the SAME sphere surface, so
    matched distances are nearly constant (std ~ noise). This is the regime
    that collapsed round-4 TPU training: one-pass var = mean(d^2) - dis^2
    cancels catastrophically, std clamps to 1e-12, and the std-gradient
    weight (dmin - dis)/((M-1) std) explodes ~1e6x past its algebraic bound
    1/sqrt(M-1)."""
    rng = np.random.default_rng(seed)
    phi = rng.uniform(0, 2 * np.pi, m)
    cth = rng.uniform(-1, 1, m)
    sth = np.sqrt(1 - cth ** 2)
    sphere = 0.05 * np.stack([sth * np.cos(phi), sth * np.sin(phi), cth], 1)
    model = jnp.asarray(sphere, jnp.float32)
    target = jnp.asarray(sphere + rng.normal(size=(m, 3)) * noise +
                         [0.1, 0.0, 0.0], jnp.float32)
    quat = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    trans = jnp.asarray(np.tile([[0.1, 0.0, 0.0]], (n, 1)), jnp.float32)
    points = jnp.zeros((n, 3), jnp.float32)
    return quat, trans, points, model, target


def test_degenerate_sphere_gradient_bounded_xla():
    """Fallback path: gradients stay near the algebraic bound on the
    near-constant-matched-distance case (regression for the round-4
    training collapse)."""
    quat, trans, points, model, target = _sphere_inputs()

    def loss(q, t, p):
        dis, std = pa.sym_moments(q, t, p, model, target, False)
        return jnp.sum(dis + 2.0 * std)

    g_q, g_t, g_p = jax.grad(loss, argnums=(0, 1, 2))(quat, trans, points)
    for g in (g_q, g_t, g_p):
        a = np.asarray(g)
        assert np.isfinite(a).all()
        # exact-math scale: |d(dis+2 std)/d pred_i| <= 1/M + 2/sqrt(M-1),
        # summed over M points and chained through R(q)/t => O(sqrt(M)).
        # Pre-fix this blew up to ~1e6.
        assert np.abs(a).max() < 50.0, np.abs(a).max()


def test_degenerate_sphere_gradient_bounded_train_kernel():
    """Fused train kernel (interpret): precursor-combined gradients stay
    bounded AND the centered variance matches the two-pass std."""
    quat, trans, points, model, target = _sphere_inputs()
    gd = jnp.ones((quat.shape[0],), jnp.float32)
    gs = jnp.full((quat.shape[0],), 2.0, jnp.float32)
    dis, std, g_q, g_t = _train_kernel_grads(
        quat, trans, points, model, target, gd, gs)
    want_dis, want_std = reference_moments(quat, trans, points, model, target)
    # rtol 1e-3: bf16x3 d2 noise (~1.5e-7 absolute on d2) is visible
    # against the ~1e-6 true spread of this deliberately degenerate case
    np.testing.assert_allclose(np.asarray(dis), np.asarray(want_dis),
                               rtol=1e-3, atol=5e-6)
    # centered variance resolves the true tiny spread instead of clamping
    np.testing.assert_allclose(np.asarray(std), np.asarray(want_std),
                               rtol=0.2, atol=2e-6)
    for g in (g_q, g_t):
        a = np.asarray(g)
        assert np.isfinite(a).all()
        assert np.abs(a).max() < 50.0, np.abs(a).max()


def test_near_coincident_points_u_bounded_train_kernel():
    """Regression for the round-4 recurring gradient spikes (grad norms
    1e4-2e5 every few epochs on TPU): when matched distances are below the
    expansion-form d2's rounding floor (~4e-4 m at these magnitudes), d2
    clamps to 0 and the old kernel normalized u = diff / max(dmin, 1e-12)
    with a ~1e-4 diff — emitting ~1e8x unit vectors. The fix normalizes by
    the DIRECT ||pred - matched||."""
    rng = np.random.default_rng(11)
    m = 64
    model = jnp.asarray(rng.normal(size=(m, 3)) * 0.05, jnp.float32)
    # target = model shifted 0.1 m (raises the pp/tt scale so the bf16x3
    # rounding floor swamps the true 4e-8 d2) ...
    target = model + jnp.asarray([0.1, 0.0, 0.0], jnp.float32)
    n = 8
    # ... and candidates that land each pred point ~2e-4 m from its target
    quat = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0, 0.0]], jnp.float32), (n, 1))
    trans = jnp.asarray([0.1, 0.0, 0.0], jnp.float32) + jnp.asarray(
        rng.normal(size=(n, 3)) * 1e-4, jnp.float32)
    points = jnp.zeros((n, 3), jnp.float32)
    gd = jnp.ones((n,), jnp.float32)
    gs = jnp.zeros((n,), jnp.float32)
    dis, std, g_q, g_t = _train_kernel_grads(
        quat, trans, points, model, target, gd, gs)
    a = np.asarray(g_t)
    assert np.isfinite(a).all()
    # exact math: g_t = sum_i u_i / M with ||u_i|| <= 1 -> |g_t| <= 1.
    # Pre-fix this was ~1e8.
    assert np.abs(a).max() < 2.0, np.abs(a).max()


def test_tiny_quat_gradient_bounded():
    """quat_to_mat's normalization floor bounds the 1/||q|| gradient
    amplification for near-zero candidate quats (the loss sees thousands of
    UNNORMALIZED head outputs per step)."""
    g_rot = jnp.ones((3, 3), jnp.float32)

    def f(q):
        return jnp.sum(T.quat_to_mat(q) * g_rot)

    for scale in (1e-7, 1e-5, 1e-3):
        q = jnp.asarray([1.0, -1.0, 0.5, 0.25], jnp.float32) * scale
        g = np.asarray(jax.grad(f)(q))
        assert np.isfinite(g).all()
        # bound ~ ||g_rot|| * 4 / eps_floor (1e-3); pre-fix 1e-7 quats gave
        # ~1e7x amplification
        assert np.abs(g).max() < 5e4, (scale, np.abs(g).max())
    # and healthy quats are bit-identical to plain normalization
    q = jnp.asarray([0.9, -0.3, 0.2, 0.1], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(T.quat_normalize(q)),
        np.asarray(q / jnp.linalg.norm(q)))


def test_refine_loss_gradient_bounded_at_coincident_points():
    """The refine-phase twin of the near-coincident-points train-kernel fix
    (round-4 discovery: a 120-epoch sym run NaN'd 12 epochs into the refine
    phase). With the target EXACTLY coincident with the predicted points —
    routine once a converged refiner meets wrap-pad-duplicated targets —
    the refiner loss gradient must stay finite and bounded on BOTH the
    symmetric (expansion-form argmin) and non-symmetric branches; the
    pre-fix sqrt-at-0 forms returned inf/nan."""
    from autoposeestimation_tpu.models import losses

    rng = np.random.default_rng(0)
    M = 16
    model_points = jnp.asarray(rng.normal(size=(1, M, 3)) * 0.05,
                               jnp.float32)
    points = jnp.asarray(rng.normal(size=(1, M, 3)) * 0.05, jnp.float32)
    pred_r = jnp.asarray([[1.0, 0.0, 0.0, 0.0]], jnp.float32)  # identity
    pred_t = jnp.zeros((1, 3), jnp.float32)
    target = model_points  # identity correction -> pred == target exactly

    for sym in (True, False):
        def f(r, t):
            mean_dis, _, _, _ = losses.refine_loss(
                r, t, target, model_points, points,
                jnp.asarray([sym]), with_sym=True)
            return mean_dis
        gr, gt = jax.grad(f, argnums=(0, 1))(pred_r, pred_t)
        for g in (gr, gt):
            a = np.asarray(g)
            assert np.isfinite(a).all(), (sym, a)
            assert np.abs(a).max() < 10.0, (sym, a)
