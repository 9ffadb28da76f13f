"""Fused symmetric ADD-S reduction as a Pallas TPU kernel (+ custom VJP).

The hot op of DenseFusion training on symmetric objects: for each of N
candidate poses, transform the M model points and match each against the M
target points by nearest neighbor — the reference burns a C++/CUDA KNN
extension on this (/root/reference/DenseFusion/lib/knn/, called from
lib/loss.py:41-47), materializing a 10^9-element index tensor.

Here each grid program owns a tile of candidates; for each candidate it builds
the transformed model points in VMEM, runs the (M, M) squared-distance tile
through the MXU, min-reduces over targets on the VPU, and accumulates the
mean and mean-square of the matched distances — nothing but the (N,) moments
ever reaches HBM.

The custom VJP recomputes the argmin matches in the backward kernel and
propagates exact gradients to (quat, trans): for matched pairs,
d dis_c / d pred_ci = (pred_ci - target_match) / (M * ||pred_ci - target_match||),
chain-ruled through pred = model @ R(q)^T + (point + t) analytically.

`sym_moments` returns (dis (N,), std (N,)) = mean/stddev over model
points of the matched distances per candidate — exactly what pose_loss
consumes for symmetric objects.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils import transforms as T

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_HI = jax.lax.Precision.HIGHEST
_TC = 64  # candidates per grid program


def _moments_kernel(pred_t_ref, rot_ref, model_ref, target_ref,
                    dis_ref, sq_ref):
    """pred_t (TC, 8): candidate translations (points + t, xyz padded)
    rot (TC, 16): row-major 3x3 rotation (padded to 16 lanes)
    model (M, 8), target (M, 8): xyz padded
    dis/sq (8, TC/8): per-candidate mean / mean-square of matched distances.
    """
    model = model_ref[:, :3]  # (M, 3)
    target = target_ref[:]    # (M, 8)
    tt = jnp.sum(target * target, axis=1)  # (M,)
    m = model.shape[0]

    def one(c, acc):
        dis_acc, sq_acc = acc
        rot = rot_ref[c, :9].reshape(3, 3)
        t = pred_t_ref[c, :3]
        pred = jnp.dot(model, rot.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST) + t  # (M, 3)
        pp = jnp.sum(pred * pred, axis=1, keepdims=True)  # (M, 1)
        cross = jnp.dot(pred, target[:, :3].T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (M, M) MXU
        d2 = pp + tt[None, :] - 2.0 * cross
        dmin = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0))  # (M,)
        dis_acc = dis_acc.at[c].set(jnp.sum(dmin) / m)
        sq_acc = sq_acc.at[c].set(jnp.sum(dmin * dmin) / m)
        return dis_acc, sq_acc

    dis, sq = jax.lax.fori_loop(
        0, _TC, one, (jnp.zeros((_TC,), jnp.float32),
                      jnp.zeros((_TC,), jnp.float32)))
    dis_ref[:, :] = dis.reshape(dis_ref.shape)
    sq_ref[:, :] = sq.reshape(sq_ref.shape)


def _pad_rows(x, mult):
    pad = (-x.shape[0]) % mult
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))


def _pad_cols(x, width):
    return jnp.pad(x, ((0, 0), (0, width - x.shape[1])))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _moments_fwd(rot, pred_t, model_points, target, interpret=False):
    """rot (N, 3, 3), pred_t (N, 3) -> (dis (N,), mean_sq (N,))."""
    n = rot.shape[0]
    rot_flat = _pad_cols(rot.reshape(n, 9).astype(jnp.float32), 16)
    ptd = _pad_cols(pred_t.astype(jnp.float32), 8)
    rot_flat = _pad_rows(rot_flat, _TC)
    ptd = _pad_rows(ptd, _TC)
    model8 = _pad_cols(model_points.astype(jnp.float32), 8)
    target8 = _pad_cols(target.astype(jnp.float32), 8)
    num_prog = rot_flat.shape[0] // _TC

    grid_spec = pl.GridSpec(
        grid=(num_prog,),
        in_specs=[
            pl.BlockSpec((_TC, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TC, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((model8.shape[0], 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((target8.shape[0], 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, _TC // 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _TC // 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    m = model_points.shape[0]
    dis, sq = pl.pallas_call(
        _moments_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_prog * 8, _TC // 8), jnp.float32),
            jax.ShapeDtypeStruct((num_prog * 8, _TC // 8), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * m * 3 + n * m * m,
            bytes_accessed=(rot_flat.size + ptd.size + model8.size
                            + target8.size + 2 * n) * 4,
            transcendentals=n * m,
        ),
    )(ptd, rot_flat, model8, target8)
    return dis.reshape(-1)[:n], sq.reshape(-1)[:n]


def _xla_match(rot, pred_t, model_points, target):
    """Reference XLA computation (also the backward's recompute): returns
    (pred (N, M, 3), matched target (N, M, 3), dmin (N, M))."""
    pred = jnp.einsum("mj,nij->nmi", model_points, rot, precision=_HI) \
        + pred_t[:, None, :]
    tt = jnp.sum(target * target, axis=1)
    pp = jnp.sum(pred * pred, axis=2)
    cross = jnp.einsum("nmi,ki->nmk", pred, target, precision=_HI)
    d2 = pp[:, :, None] + tt[None, None, :] - 2.0 * cross
    idx = jnp.argmin(d2, axis=2)
    matched = target[idx]
    dmin = jnp.sqrt(jnp.maximum(jnp.take_along_axis(
        d2, idx[:, :, None], axis=2)[:, :, 0], 0.0))
    return pred, matched, dmin


def _moments_core(quat, trans, points, model_points, target, use_pallas):
    rot = T.quat_to_mat(quat)
    pred_t = points + trans
    if use_pallas and _HAS_PALLAS and jax.default_backend() == "tpu":
        dis, sq = _moments_fwd(rot, pred_t, model_points, target)
        var = jnp.maximum(sq - dis * dis, 0.0)
        return dis, jnp.sqrt(var)
    _, _, dmin = _xla_match(rot, pred_t, model_points, target)
    return jnp.mean(dmin, axis=1), jnp.std(dmin, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def sym_moments(quat, trans, points, model_points, target, use_pallas=True):
    """(dis (N,), std (N,)) of matched distances; differentiable in
    (quat, trans, points)."""
    return _moments_core(quat, trans, points, model_points, target,
                         use_pallas)


def _sym_moments_fwd(quat, trans, points, model_points, target, use_pallas):
    out = _moments_core(quat, trans, points, model_points, target, use_pallas)
    return out, (quat, trans, points, model_points, target, out)


def _sym_moments_bwd(use_pallas, res, grads):
    quat, trans, points, model_points, target, (dis, std) = res
    g_dis, g_std = grads
    m = model_points.shape[0]

    def per_candidate(q, t, p, gd, gs, dis_c, std_c):
        rot = T.quat_to_mat(q)
        pred = model_points @ rot.T + (p + t)
        tt = jnp.sum(target * target, axis=1)
        pp = jnp.sum(pred * pred, axis=1)
        d2 = pp[:, None] + tt[None, :] - 2.0 * pred @ target.T
        idx = jnp.argmin(d2, axis=1)
        matched = target[idx]
        diff = pred - matched
        dmin = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=1), 1e-24))
        # d dis/d pred_i = diff_i/(M*dmin_i); d std/d pred_i =
        # (dmin_i - dis)/(M*std) * diff_i/dmin_i
        w_dis = gd / m
        w_std = gs * (dmin - dis_c) / (m * jnp.maximum(std_c, 1e-12))
        g_pred = diff / dmin[:, None] * (w_dis + w_std)[:, None]  # (M, 3)
        g_t = jnp.sum(g_pred, axis=0)
        g_rot = jnp.einsum("mi,mj->ij", g_pred, model_points, precision=_HI)
        g_q = jax.grad(lambda qq: jnp.sum(T.quat_to_mat(qq) * g_rot))(q)
        return g_q, g_t, g_t  # d/d trans == d/d points == g_t

    g_q, g_t, g_p = jax.vmap(per_candidate)(quat, trans, points, g_dis,
                                            g_std, dis, std)
    return g_q, g_t, g_p, None, None


sym_moments.defvjp(_sym_moments_fwd, _sym_moments_bwd)
