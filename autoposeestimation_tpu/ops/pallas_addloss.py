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


def _split_bf16(x):
    """f32 -> (hi, lo) bf16 pair with x == hi + lo to ~2^-16 relative."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_f32x3(a, b):
    """a @ b for f32 operands as three DEFAULT-precision bf16 MXU passes
    (hi*hi + hi*lo + lo*hi, f32 accumulation): the same bf16x3 construction
    as lax.Precision.HIGH (which Mosaic does not lower), ~2^-16 relative
    error vs 6-pass HIGHEST — used for the kernels' dominant (M, M) tiles
    where distances only feed min/compare and the loss moments."""
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)
    acc = jnp.dot(ah, bh, preferred_element_type=jnp.float32)
    acc += jnp.dot(ah, bl, preferred_element_type=jnp.float32)
    acc += jnp.dot(al, bh, preferred_element_type=jnp.float32)
    return acc


def _moments_kernel(pred_t_ref, rot_ref, model_ref, target_ref,
                    dis_ref, var_ref, *, cross_dtype=jnp.float32):
    """pred_t (TC, 8): candidate translations (points + t, xyz padded)
    rot (TC*3, 8): 3 rotation-matrix rows per candidate (xyz in cols 0..2)
    model (M, 8), target (M, 8): xyz padded
    dis/var (8, TC/8): per-candidate mean / centered sample variance
    (ddof=1) of matched distances.

    Scatter doesn't lower in Mosaic; candidates accumulate into the (8, TC/8)
    output tile via a broadcasted-iota select, and per-candidate rows come
    from ref dynamic slices.
    """
    # model_ref cols: [x, y, z, 1, 0...]; target_ref cols: [-2x, -2y, -2z,
    # ||t||^2, 1, 0...] — homogeneous columns fold the translation into the
    # first matmul and BOTH the ||t||^2 and ||pred||^2 terms into the
    # second (K=5), so d2 comes straight off the MXU with no extra (M, M)
    # VPU add pass. Intermediates stay >= 2D (Mosaic rejects 1xM
    # replicated-layout vectors). cross_dtype=bfloat16 runs the (M, M)
    # distance matmul in bf16 with f32 accumulation (~0.4% relative dmin
    # noise) — opt-in speed mode.
    model_aug = model_ref[:, :4]   # (M, 4)
    target_aug = target_ref[:, :5]  # (M, 5)
    m = model_aug.shape[0]
    rows = dis_ref.shape[0]
    cols = dis_ref.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    ones_col = jnp.ones((m, 1), jnp.float32)

    def one(c, acc):
        dis_acc, var_acc = acc
        rot = rot_ref[pl.ds(3 * c, 3), :3]        # (3, 3) = R_c rows
        t = pred_t_ref[pl.ds(c, 1), :3]           # (1, 3)
        rot_aug = jnp.concatenate([rot, t], axis=0)  # (4, 3): [R^T rows; t]
        pred = jnp.dot(model_aug, rot_aug,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # (M, 3)
        pp = jnp.sum(pred * pred, axis=1, keepdims=True)  # (M, 1)
        pred_aug = jnp.concatenate([pred, ones_col, pp], axis=1)  # (M, 5)
        # f32 mode runs the dominant (M, M) tile as manual bf16x3
        # (_dot_f32x3, the Precision.HIGH construction — Mosaic doesn't
        # lower HIGH) instead of 6-pass HIGHEST: ~2^-16 relative error on
        # distances that only feed min/compare and the loss moments
        if cross_dtype == jnp.bfloat16:
            d2 = jnp.dot(pred_aug.astype(cross_dtype),
                         target_aug.T.astype(cross_dtype),
                         preferred_element_type=jnp.float32)  # (M, M) MXU
        else:
            d2 = _dot_f32x3(pred_aug, target_aug.T)
        dmin2 = jnp.maximum(jnp.min(d2, axis=1, keepdims=True), 0.0)  # (M, 1)
        dmin = jnp.sqrt(dmin2)
        here = (row_ids == c // cols) & (col_ids == c % cols)
        dis = jnp.sum(dmin) / m
        # centered (two-pass) sample variance: mean(dmin^2) - dis^2 suffers
        # catastrophic f32 cancellation when the matched distances are
        # nearly constant (a near-spherical symmetric object at
        # convergence: true sigma ~1e-6 under ~1e-9 noise on dis^2 ~ 1e-2)
        dd = dmin - dis
        dis_acc = jnp.where(here, dis, dis_acc)
        var_acc = jnp.where(here, jnp.sum(dd * dd) / max(m - 1, 1), var_acc)
        return dis_acc, var_acc

    dis, var = jax.lax.fori_loop(
        0, _TC, one, (jnp.zeros((rows, cols), jnp.float32),
                      jnp.zeros((rows, cols), jnp.float32)))
    dis_ref[:, :] = dis
    var_ref[:, :] = var


def _pad_rows(x, mult):
    pad = (-x.shape[0]) % mult
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))


def _pad_cols(x, width):
    return jnp.pad(x, ((0, 0), (0, width - x.shape[1])))


@functools.partial(jax.jit, static_argnames=("interpret", "cross_dtype"))
def _moments_fwd(rot, pred_t, model_points, target, interpret=False,
                 cross_dtype=jnp.float32):
    """rot (N, 3, 3), pred_t (N, 3) -> (dis (N,), sample var ddof=1 (N,))."""
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
        [-2.0 * tgt, jnp.sum(tgt * tgt, axis=1, keepdims=True),
         jnp.ones((tgt.shape[0], 1), jnp.float32)], axis=1), 8)
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
        functools.partial(_moments_kernel, cross_dtype=cross_dtype),
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


def _train_kernel(pred_t_ref, rot_ref, model_ref, target_ref, out_ref, *,
                  cross_dtype=jnp.float32):
    """Training forward: per-candidate moments PLUS gradient precursors, one
    pass over the (M, M) distance tile in VMEM.

    The cotangent enters the pose gradient linearly: with u_i the unit
    vector from the matched target to pred_i,

      g_t   = g_dis * A_t + g_std * B_t,      A_t = sum_i u_i / M
      g_rot = g_dis * A_r + g_std * B_r,      A_r = u^T model / M
      B_*   = same with u_i weighted by (dmin_i - dis) / ((M-1) * std)

    so the kernel emits (dis, sq, A_t(3), B_t(3), A_r(9), B_r(9)) per
    candidate and the backward pass is a 26-scalar linear combination in
    plain XLA — no second (M, M) kernel. Nearest-target matching uses a
    normalized min-indicator (Mosaic has no gather): exact ties average
    their cotangents, gradient-identical for duplicated wrap-padded targets.

    out (TC, 32): cols 0..2 A_t, 3..5 B_t, 6..14 A_r, 15..23 B_r,
    24 dis, 25 sample variance (ddof=1, centered).
    """
    model_aug = model_ref[:, :4]    # (M, 4)
    target_aug = target_ref[:, :5]  # (M, 5): [-2t, ||t||^2, 1]
    traw = target_aug[:, :3] * -0.5
    m = model_aug.shape[0]
    traw4_f32 = jnp.concatenate(
        [traw, jnp.ones((m, 1), jnp.float32)], axis=1)
    traw4 = traw4_f32.astype(cross_dtype)
    rows = out_ref.shape[0]
    cols = out_ref.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    ones_col = jnp.ones((m, 1), jnp.float32)
    inv_m = 1.0 / m
    inv_m1 = 1.0 / max(m - 1, 1)

    def one(c, acc):
        rot = rot_ref[pl.ds(3 * c, 3), :3]
        t = pred_t_ref[pl.ds(c, 1), :3]
        rot_aug = jnp.concatenate([rot, t], axis=0)   # (4, 3)
        pred = jnp.dot(model_aug, rot_aug,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # (M, 3)
        pp = jnp.sum(pred * pred, axis=1, keepdims=True)
        pred_aug = jnp.concatenate([pred, ones_col, pp], axis=1)  # (M, 5)
        # dominant (M, M) tile: bf16 single pass or manual bf16x3
        # (_dot_f32x3; Mosaic doesn't lower Precision.HIGH)
        if cross_dtype == jnp.bfloat16:
            d2 = jnp.dot(pred_aug.astype(cross_dtype),
                         target_aug.T.astype(cross_dtype),
                         preferred_element_type=jnp.float32)  # (M, M)
        else:
            d2 = _dot_f32x3(pred_aug, target_aug.T)
        dmin2 = jnp.min(d2, axis=1, keepdims=True)
        dmin2c = jnp.maximum(dmin2, 0.0)
        dmin = jnp.sqrt(dmin2c)                        # (M, 1)
        dis = jnp.sum(dmin) * inv_m                    # scalar
        # centered sample variance: the one-pass mean(d^2) - dis^2 form
        # cancels catastrophically when matched distances are nearly
        # constant (near-spherical symmetric object at convergence) — the
        # clamped-to-1e-12 std then DIVIDES the real ~1e-6 spread in wvec,
        # emitting ~1e6x gradients (the round-4 epoch-5 training collapse)
        dd = dmin - dis                                # (M, 1)
        var = jnp.sum(dd * dd) * inv_m1
        std = jnp.maximum(jnp.sqrt(var), 1e-12)

        # one matmul yields both the tie-normalizer and the matched sum:
        # ind @ [traw | 1] -> cols 0..2 sum of tied targets, col 3 tie count
        ind = (d2 <= dmin2).astype(jnp.bfloat16)       # (M, M), 0/1 exact
        if cross_dtype == jnp.bfloat16:
            mn = jnp.dot(ind, traw4,
                         preferred_element_type=jnp.float32)  # (M, 4)
        else:
            # 0/1 is exact in bf16, so only traw4 needs the hi/lo split:
            # two DEFAULT passes reproduce the f32 product exactly up to
            # the dropped 2^-16 residual
            th, tl = _split_bf16(traw4_f32)
            mn = jnp.dot(ind, th, preferred_element_type=jnp.float32) \
                + jnp.dot(ind, tl, preferred_element_type=jnp.float32)
        row_norm = mn[:, 3:4]
        matched = mn[:, :3] / row_norm
        # normalize u by the DIRECT ||pred - matched||, not the
        # expansion-form dmin: d2 = ||p||^2+||t||^2-2pt carries ~1e-7
        # absolute rounding error, so for matched distances under ~4e-4 m
        # (routine once a symmetric object converges) dmin can clamp to 0
        # while diff is ~1e-4 — u then blows up ~1e8x instead of staying
        # unit-norm. This was the round-4 recurring-gradient-spike bug
        # (grad norms 1e4-2e5 every few epochs, each poisoning Adam's
        # second moment for dozens of epochs).
        diff = pred - matched                          # (M, 3)
        dn2 = jnp.sum(diff * diff, axis=1, keepdims=True)
        u = diff / jnp.sqrt(jnp.maximum(dn2, 1e-24))   # (M, 3), ||u|| <= 1
        # |dd_i| <= sqrt(M-1)*std is an algebraic identity, so |wvec| <=
        # 1/sqrt(M-1) in exact arithmetic — the clip is a no-op on healthy
        # values and bounds the gradient under any residual rounding
        wcap = 1.0 / float(max(m - 1, 1)) ** 0.5
        wvec = jnp.clip(dd * inv_m1 / std, -wcap, wcap)  # (M, 1)
        wu = u * wvec
        # A_r = u^T model / M, B_r = wu^T model  (3, 3) K=M matmuls
        a_r = jnp.dot(u.T, model_aug[:, :3],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST) * inv_m
        b_r = jnp.dot(wu.T, model_aug[:, :3],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)

        here = row_ids == c
        vals = [jnp.sum(u[:, 0:1]) * inv_m, jnp.sum(u[:, 1:2]) * inv_m,
                jnp.sum(u[:, 2:3]) * inv_m,
                jnp.sum(wu[:, 0:1]), jnp.sum(wu[:, 1:2]),
                jnp.sum(wu[:, 2:3])]
        for ai in range(3):
            for bj in range(3):
                vals.append(a_r[ai, bj])
        for ai in range(3):
            for bj in range(3):
                vals.append(b_r[ai, bj])
        vals.append(dis)
        vals.append(var)
        for k, v in enumerate(vals):
            acc = jnp.where(here & (col_ids == k), v, acc)
        return acc

    out_ref[:, :] = jax.lax.fori_loop(
        0, _TC, one, jnp.zeros((rows, cols), jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret", "cross_dtype"))
def _moments_train_pallas(rot, pred_t, model_points, target,
                          interpret=False, cross_dtype=jnp.float32):
    """(dis, var, A_t (N,3), B_t (N,3), A_r (N,3,3), B_r (N,3,3)) via the
    fused training kernel."""
    n = rot.shape[0]
    rot_rows = _pad_cols(
        rot.transpose(0, 2, 1).reshape(n * 3, 3).astype(jnp.float32), 8)
    ptd = _pad_cols(pred_t.astype(jnp.float32), 8)
    rot_rows = _pad_rows(rot_rows, 3 * _TC)
    ptd = _pad_rows(ptd, _TC)
    model8 = _pad_cols(jnp.concatenate(
        [model_points.astype(jnp.float32),
         jnp.ones((model_points.shape[0], 1), jnp.float32)], axis=1), 8)
    tgt = target.astype(jnp.float32)
    target8 = _pad_cols(jnp.concatenate(
        [-2.0 * tgt, jnp.sum(tgt * tgt, axis=1, keepdims=True),
         jnp.ones((tgt.shape[0], 1), jnp.float32)], axis=1), 8)
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
            pl.BlockSpec((_TC, 32), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    m = model_points.shape[0]
    (out,) = pl.pallas_call(
        functools.partial(_train_kernel, cross_dtype=cross_dtype),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_prog * _TC, 32), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * (m * 4 + m * 3 + m + 18),
            bytes_accessed=(rot_rows.size + ptd.size + model8.size
                            + target8.size + 32 * n) * 4,
            transcendentals=n * m,
        ),
    )(ptd, rot_rows, model8, target8)
    out = out[:n]
    return (out[:, 24], out[:, 25], out[:, 0:3], out[:, 3:6],
            out[:, 6:15].reshape(n, 3, 3), out[:, 15:24].reshape(n, 3, 3))


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
    if _use_kernel(use_pallas):
        dis, var = _moments_fwd(rot, pred_t, model_points, target,
                                cross_dtype=_cross_dtype(use_pallas))
        return dis, jnp.sqrt(jnp.maximum(var, 0.0))
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


def _use_kernel(use_pallas) -> bool:
    return bool(use_pallas) and _HAS_PALLAS and jax.default_backend() == "tpu"


def _cross_dtype(use_pallas):
    """use_pallas: False = chunked XLA, True = exact f32 kernel, "bf16" =
    bf16 distance matmuls with f32 accumulation (~3% relative moment error
    on random clouds, larger near convergence where d2 cancellation
    dominates — TRAINING-only speed mode, ~3x on the kernels; keep eval /
    checkpoint selection on the exact path)."""
    return jnp.bfloat16 if use_pallas == "bf16" else jnp.float32


def _sym_moments_fwd(quat, trans, points, model_points, target, use_pallas):
    if _use_kernel(use_pallas):
        # training path: ONE kernel pass emits moments + gradient
        # precursors; the backward is a cheap linear combination
        rot = T.quat_to_mat(quat)
        dis, var, a_t, b_t, a_r, b_r = _moments_train_pallas(
            rot, points + trans, model_points, target,
            cross_dtype=_cross_dtype(use_pallas))
        std = jnp.sqrt(jnp.maximum(var, 0.0))
        return (dis, std), (quat, None, None, None, None,
                            (a_t, b_t, a_r, b_r))
    out = _moments_core(quat, trans, points, model_points, target, use_pallas)
    return out, (quat, trans, points, model_points, target, out)


def _sym_moments_bwd(use_pallas, res, grads):
    quat, trans, points, model_points, target, saved = res
    g_dis, g_std = grads

    if _use_kernel(use_pallas):
        a_t, b_t, a_r, b_r = saved
        g_t = g_dis[:, None] * a_t + g_std[:, None] * b_t
        g_rot = (g_dis[:, None, None] * a_r + g_std[:, None, None] * b_r)
        # chain rule quat -> R outside the kernel (N x tiny, vectorized)
        g_q = jax.vmap(lambda q, gr: jax.grad(
            lambda qq: jnp.sum(T.quat_to_mat(qq) * gr))(q))(quat, g_rot)
        return g_q, g_t, g_t, None, None

    (dis, std) = saved
    m = model_points.shape[0]
    n = quat.shape[0]

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
        # clip to the algebraic bound |(dmin-dis)/((M-1) std)| <=
        # 1/sqrt(M-1): a no-op on healthy values, bounds the gradient when
        # the forward's std (saved) and the recomputed dmin disagree at the
        # rounding floor (near-constant matched distances)
        wcap = 1.0 / float(max(m - 1, 1)) ** 0.5
        w_std = gs * jnp.clip(
            (dmin - dis_c) / (max(m - 1, 1) * jnp.maximum(std_c, 1e-12)),
            -wcap, wcap)
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
