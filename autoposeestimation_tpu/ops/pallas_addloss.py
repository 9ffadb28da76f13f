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

`sym_moments` returns (dis (N,), std (N,)) = mean/sample-stddev (ddof=1,
matching the reference's torch.std at lib/loss.py:52) over model points of
the matched distances per candidate — exactly what pose_loss consumes for
symmetric objects.

The non-TPU forward fallback and the backward recompute are chunked over
candidates (lax.map of vmapped chunks) so only one (chunk, M, M) distance
tile is ever live — at reference defaults the unchunked tensor is ~32 GB.
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
    rot (TC*3, 8): 3 rotation-matrix rows per candidate (xyz in cols 0..2)
    model (M, 8), target (M, 8): xyz padded
    dis/sq (8, TC/8): per-candidate mean / mean-square of matched distances.

    Scatter doesn't lower in Mosaic; candidates accumulate into the (8, TC/8)
    output tile via a broadcasted-iota select, and per-candidate rows come
    from ref dynamic slices.
    """
    # model_ref cols: [x, y, z, 1, 0...]; target_ref cols: [-2x, -2y, -2z,
    # ||t||^2, 0...] — the homogeneous column folds the translation into the
    # first matmul and the ||t||^2 row into the second, keeping every
    # intermediate >= 2D (Mosaic rejects 1xM replicated-layout vectors).
    model_aug = model_ref[:, :4]   # (M, 4)
    target_aug = target_ref[:, :4]  # (M, 4)
    m = model_aug.shape[0]
    rows = dis_ref.shape[0]
    cols = dis_ref.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    ones_col = jnp.ones((m, 1), jnp.float32)

    def one(c, acc):
        dis_acc, sq_acc = acc
        rot = rot_ref[pl.ds(3 * c, 3), :3]        # (3, 3) = R_c rows
        t = pred_t_ref[pl.ds(c, 1), :3]           # (1, 3)
        rot_aug = jnp.concatenate([rot, t], axis=0)  # (4, 3): [R^T rows; t]
        pred = jnp.dot(model_aug, rot_aug,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # (M, 3)
        pp = jnp.sum(pred * pred, axis=1, keepdims=True)  # (M, 1)
        pred_aug = jnp.concatenate([pred, ones_col], axis=1)  # (M, 4)
        cross = jnp.dot(pred_aug, target_aug.T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (M, M) MXU
        d2 = pp + cross
        dmin2 = jnp.maximum(jnp.min(d2, axis=1, keepdims=True), 0.0)  # (M, 1)
        dmin = jnp.sqrt(dmin2)
        here = (row_ids == c // cols) & (col_ids == c % cols)
        dis_acc = jnp.where(here, jnp.sum(dmin) / m, dis_acc)
        sq_acc = jnp.where(here, jnp.sum(dmin2) / m, sq_acc)
        return dis_acc, sq_acc

    dis, sq = jax.lax.fori_loop(
        0, _TC, one, (jnp.zeros((rows, cols), jnp.float32),
                      jnp.zeros((rows, cols), jnp.float32)))
    dis_ref[:, :] = dis
    sq_ref[:, :] = sq


def _pad_rows(x, mult):
    pad = (-x.shape[0]) % mult
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))


def _pad_cols(x, width):
    return jnp.pad(x, ((0, 0), (0, width - x.shape[1])))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _moments_fwd(rot, pred_t, model_points, target, interpret=False):
    """rot (N, 3, 3), pred_t (N, 3) -> (dis (N,), mean_sq (N,))."""
    n = rot.shape[0]
    # 3 rows of R^T per candidate, stacked: rows [3c, 3c+3) = R_c^T, so the
    # kernel's homogeneous matmul computes model @ R^T + t directly
    rot_rows = _pad_cols(
        rot.transpose(0, 2, 1).reshape(n * 3, 3).astype(jnp.float32), 8)
    ptd = _pad_cols(pred_t.astype(jnp.float32), 8)
    rot_rows = _pad_rows(rot_rows, 3 * _TC)
    ptd = _pad_rows(ptd, _TC)
    # homogeneous model column ([x, y, z, 1]) and target encoding
    # ([-2x, -2y, -2z, ||t||^2]) for the fused distance expansion
    model8 = _pad_cols(jnp.concatenate(
        [model_points.astype(jnp.float32),
         jnp.ones((model_points.shape[0], 1), jnp.float32)], axis=1), 8)
    tgt = target.astype(jnp.float32)
    target8 = _pad_cols(jnp.concatenate(
        [-2.0 * tgt, jnp.sum(tgt * tgt, axis=1, keepdims=True)], axis=1), 8)
    num_prog = ptd.shape[0] // _TC

    grid_spec = pl.GridSpec(
        grid=(num_prog,),
        in_specs=[
            pl.BlockSpec((_TC, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * _TC, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
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
            bytes_accessed=(rot_rows.size + ptd.size + model8.size
                            + target8.size + 2 * n) * 4,
            transcendentals=n * m,
        ),
    )(ptd, rot_rows, model8, target8)
    return dis.reshape(-1)[:n], sq.reshape(-1)[:n]


def _bwd_kernel(scal_ref, pred_t_ref, rot_ref, model_ref, target_ref,
                out_ref):
    """Backward companion of _moments_kernel: recomputes the (M, M) distance
    tile in VMEM per candidate and reduces it straight to the 12 gradient
    scalars (g_t (3,) and g_rot (3, 3) flattened) — no (N, M, M) tensor and
    no sequential host-chunked map ever touches HBM.

    scal (TC, 8): per-candidate (g_dis, g_std, dis, std) in cols 0..3.
    pred_t (TC, 8), rot (TC*3, 8), model (M, 8), target (M, 8): the forward
    kernel's layouts (model cols [x,y,z,1]; target cols [-2x,-2y,-2z,||t||^2]).
    out (8, (TC/8)*12): candidate c's 12 scalars live at row c//8,
    cols (c%8)*12 .. +12 (unpacked by the host wrapper).

    Nearest-target matching uses a normalized min-indicator instead of an
    argmin+gather (Mosaic has no gather/scatter): exact ties average their
    cotangents — identical gradients for duplicated (wrap-padded) targets,
    a measure-zero subgradient choice otherwise.
    """
    model_aug = model_ref[:, :4]    # (M, 4)
    target_aug = target_ref[:, :4]  # (M, 4)
    traw = target_aug[:, :3] * -0.5  # raw target xyz
    m = model_aug.shape[0]
    rows = out_ref.shape[0]
    cols = out_ref.shape[1]
    ncol = cols // 12
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    ones_col = jnp.ones((m, 1), jnp.float32)
    inv_m = 1.0 / m
    inv_m1 = 1.0 / max(m - 1, 1)

    def one(c, acc):
        rot = rot_ref[pl.ds(3 * c, 3), :3]       # (3, 3) = R^T rows
        t = pred_t_ref[pl.ds(c, 1), :3]          # (1, 3)
        sc = scal_ref[pl.ds(c, 1), :4]           # (1, 4)
        gd = sc[:, 0:1]                          # (1, 1)
        gs = sc[:, 1:2]
        dis_c = sc[:, 2:3]
        std_c = sc[:, 3:4]
        rot_aug = jnp.concatenate([rot, t], axis=0)   # (4, 3)
        pred = jnp.dot(model_aug, rot_aug,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # (M, 3)
        pp = jnp.sum(pred * pred, axis=1, keepdims=True)     # (M, 1)
        pred_aug = jnp.concatenate([pred, ones_col], axis=1)  # (M, 4)
        cross = jnp.dot(pred_aug, target_aug.T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (M, M)
        d2 = pp + cross
        dmin2 = jnp.min(d2, axis=1, keepdims=True)            # (M, 1)
        dmin = jnp.sqrt(jnp.maximum(dmin2, 1e-24))
        ind = (d2 <= dmin2).astype(jnp.float32)               # (M, M)
        row_norm = jnp.sum(ind, axis=1, keepdims=True)        # (M, 1)
        # d dis/d pred_i = diff_i/(M*dmin_i); sample std (ddof=1):
        # d std/d pred_i = (dmin_i - dis)/((M-1)*std) * diff_i/dmin_i
        a = gd * inv_m + gs * (dmin - dis_c) * inv_m1 / jnp.maximum(
            std_c, 1e-12)                                     # (M, 1)
        coef = a / dmin                                       # (M, 1)
        w = ind * (coef / row_norm)                           # (M, M)
        g_pred = coef * pred - jnp.dot(
            w, traw, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)              # (M, 3)

        r = c // ncol
        base = (c % ncol) * 12
        here_row = row_ids == r
        for k in range(3):
            val = jnp.sum(g_pred[:, k:k + 1])
            acc = jnp.where(here_row & (col_ids == base + k), val, acc)
        for ai in range(3):
            gcol = g_pred[:, ai:ai + 1]
            for bj in range(3):
                val = jnp.sum(gcol * model_aug[:, bj:bj + 1])
                acc = jnp.where(
                    here_row & (col_ids == base + 3 + 3 * ai + bj), val, acc)
        return acc

    out_ref[:, :] = jax.lax.fori_loop(
        0, _TC, one, jnp.zeros((rows, cols), jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _moments_bwd_pallas(rot, pred_t, model_points, target, g_dis, g_std,
                        dis, std, interpret=False):
    """(g_t (N, 3), g_rot (N, 3, 3)) via the fused backward kernel."""
    n = rot.shape[0]
    rot_rows = _pad_cols(
        rot.transpose(0, 2, 1).reshape(n * 3, 3).astype(jnp.float32), 8)
    ptd = _pad_cols(pred_t.astype(jnp.float32), 8)
    scal = _pad_cols(jnp.stack(
        [g_dis, g_std, dis, std], axis=1).astype(jnp.float32), 8)
    rot_rows = _pad_rows(rot_rows, 3 * _TC)
    ptd = _pad_rows(ptd, _TC)
    scal = _pad_rows(scal, _TC)
    model8 = _pad_cols(jnp.concatenate(
        [model_points.astype(jnp.float32),
         jnp.ones((model_points.shape[0], 1), jnp.float32)], axis=1), 8)
    tgt = target.astype(jnp.float32)
    target8 = _pad_cols(jnp.concatenate(
        [-2.0 * tgt, jnp.sum(tgt * tgt, axis=1, keepdims=True)], axis=1), 8)
    num_prog = ptd.shape[0] // _TC
    ncol = _TC // 8

    grid_spec = pl.GridSpec(
        grid=(num_prog,),
        in_specs=[
            pl.BlockSpec((_TC, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TC, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * _TC, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((model8.shape[0], 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((target8.shape[0], 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, ncol * 12), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    m = model_points.shape[0]
    (out,) = pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_prog * 8, ncol * 12),
                                        jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * (m * 4 + m * 3 + 12),
            bytes_accessed=(rot_rows.size + ptd.size + scal.size
                            + model8.size + target8.size + 12 * n) * 4,
            transcendentals=n * m,
        ),
    )(scal, ptd, rot_rows, model8, target8)
    # unpack: candidate c -> [prog, c//8 (row), c%8 (slot), 12]
    out = out.reshape(num_prog, 8, ncol, 12).reshape(-1, 12)[:n]
    return out[:, :3], out[:, 3:12].reshape(n, 3, 3)


# Bound on the (chunk, M, M) distance-tile footprint of the chunked XLA
# paths: chunk * M^2 <= 2^24 f32 elements (~64 MB). At reference defaults
# (N=1000 candidates x batch 8, M=1000 mesh points) the un-chunked tensor
# would be ~32 GB — far past HBM.
_CHUNK_ELEMS = 1 << 24


def _chunk_size(n: int, m: int) -> int:
    return max(1, min(n, _CHUNK_ELEMS // max(m * m, 1)))


def _map_chunked(per_item_fn, args, n: int, chunk: int):
    """vmap(per_item_fn) over leading-axis chunks via lax.map, bounding live
    memory to one chunk's intermediates. Zero-pads to a chunk multiple
    (zero quats map to the identity rotation), unpads the outputs."""
    pad = (-n) % chunk

    def prep(x):
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        return x.reshape(((n + pad) // chunk, chunk) + x.shape[1:])

    out = jax.lax.map(lambda c: jax.vmap(per_item_fn)(*c),
                      tuple(prep(a) for a in args))
    return jax.tree_util.tree_map(
        lambda o: o.reshape((-1,) + o.shape[2:])[:n], out)


def _dmin_candidate(rot, pred_t, model_points, target):
    """One candidate's matched distances (M,): min over targets of
    ||model @ R^T + t - target||."""
    pred = jnp.dot(model_points, rot.T, precision=_HI) + pred_t  # (M, 3)
    tt = jnp.sum(target * target, axis=1)
    pp = jnp.sum(pred * pred, axis=1)
    d2 = pp[:, None] + tt[None, :] - 2.0 * jnp.dot(pred, target.T,
                                                   precision=_HI)
    return jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0))


def _moments_core(quat, trans, points, model_points, target, use_pallas):
    rot = T.quat_to_mat(quat)
    pred_t = points + trans
    n, m = rot.shape[0], model_points.shape[0]
    # sample std (ddof=1) matches torch.std in the reference loss
    # (/root/reference/DenseFusion/lib/loss.py:52)
    bessel = m / max(m - 1, 1)
    if use_pallas and _HAS_PALLAS and jax.default_backend() == "tpu":
        dis, sq = _moments_fwd(rot, pred_t, model_points, target)
        var = jnp.maximum(sq - dis * dis, 0.0) * bessel
        return dis, jnp.sqrt(var)
    dmin = _map_chunked(
        lambda r, pt: _dmin_candidate(r, pt, model_points, target),
        (rot, pred_t), n, _chunk_size(n, m))
    return jnp.mean(dmin, axis=1), jnp.std(dmin, axis=1, ddof=1)


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
    n = quat.shape[0]

    if use_pallas and _HAS_PALLAS and jax.default_backend() == "tpu":
        rot = T.quat_to_mat(quat)
        g_t, g_rot = _moments_bwd_pallas(rot, points + trans, model_points,
                                         target, g_dis, g_std, dis, std)
        # chain rule quat -> R outside the kernel (N x tiny, vectorized)
        g_q = jax.vmap(lambda q, gr: jax.grad(
            lambda qq: jnp.sum(T.quat_to_mat(qq) * gr))(q))(quat, g_rot)
        return g_q, g_t, g_t, None, None

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
        # d dis/d pred_i = diff_i/(M*dmin_i); sample std (ddof=1):
        # d std/d pred_i = (dmin_i - dis)/((M-1)*std) * diff_i/dmin_i
        w_dis = gd / m
        w_std = gs * (dmin - dis_c) / (max(m - 1, 1)
                                       * jnp.maximum(std_c, 1e-12))
        g_pred = diff / dmin[:, None] * (w_dis + w_std)[:, None]  # (M, 3)
        g_t = jnp.sum(g_pred, axis=0)
        g_rot = jnp.einsum("mi,mj->ij", g_pred, model_points, precision=_HI)
        g_q = jax.grad(lambda qq: jnp.sum(T.quat_to_mat(qq) * g_rot))(q)
        return g_q, g_t, g_t  # d/d trans == d/d points == g_t

    # chunked argmin recompute: each chunk rebuilds only a (chunk, M, M)
    # distance tile, never the full (N, M, M)
    g_q, g_t, g_p = _map_chunked(
        per_candidate, (quat, trans, points, g_dis, g_std, dis, std),
        n, _chunk_size(n, m))
    return g_q, g_t, g_p, None, None


sym_moments.defvjp(_sym_moments_fwd, _sym_moments_bwd)
