"""Nearest-neighbor ops: the TPU-native replacement for the reference's
C++/CUDA KNN extension (/root/reference/DenseFusion/lib/knn/ — shared-memory
tiled SSD distance matrix `cuComputeDistanceGlobal` + per-column insertion sort
`cuInsertionSort`).

Three implementations, one semantic:
  * `nn_xla`    — chunked ||a-b||^2 expansion + argmin in pure XLA. Works on
                  any backend; the fallback and the vjp-free eval path.
  * `nn_pallas` — a fused Pallas TPU kernel: the query-by-reference distance
                  tile never leaves VMEM; the matmul rides the MXU and the
                  running min/argmin epilogue rides the VPU. Used on TPU.
  * native/knn_cpu.cpp — exact C++ golden for tests (mirrors the role of the
                  reference's knn_cpu.cpp), loaded via ctypes.

The reference only ever uses k=1 (loss.py:13 constructs KNearestNeighbor(1)),
so the hot op is argmin; `knn_k` (top-k) exists for the statistical outlier
removal in the reconstruction pipeline. `min_dists` skips index materialization
entirely for the symmetric ADD-S loss (mean-of-min distances needs no gather).

All ops take optional validity masks so padded static-shape clouds work:
invalid reference points never win, invalid queries return index 0 / dist inf.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _pad_dim(x, multiple: int, axis: int, value=0.0):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _dist2_block(q, r):
    """Squared euclidean distances (Q, R) between q (Q, 3) and r (R, 3)."""
    qq = jnp.sum(q * q, axis=-1, keepdims=True)
    rr = jnp.sum(r * r, axis=-1, keepdims=True).T
    qr = jnp.dot(q, r.T, precision=_HI)
    return jnp.maximum(qq + rr - 2.0 * qr, 0.0)


def nn_xla(query, ref, ref_valid=None, chunk: int = 2048):
    """Nearest reference point per query: (indices (N,), sq-distances (N,)).

    Chunked over queries so the (chunk, M) distance block bounds memory.
    """
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    n = query.shape[0]
    if ref_valid is None:
        ref_valid = jnp.ones(ref.shape[0], bool)
    bad = jnp.float32(jnp.inf)

    qpad = _pad_dim(query, chunk, 0)
    blocks = qpad.reshape(-1, chunk, 3)

    def one(qb):
        d2 = _dist2_block(qb, ref)
        d2 = jnp.where(ref_valid[None, :], d2, bad)
        idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
        return idx, jnp.min(d2, axis=1)

    idx, d2 = jax.lax.map(one, blocks)
    return idx.reshape(-1)[:n], d2.reshape(-1)[:n]


def min_dists_xla(query, ref, ref_valid=None, chunk: int = 2048):
    """Only the min distances (sqrt'ed) — the symmetric ADD-S reduction."""
    _, d2 = nn_xla(query, ref, ref_valid, chunk)
    return jnp.sqrt(d2)


def knn_k(query, ref, k: int, ref_valid=None, chunk: int = 1024):
    """k nearest reference points per query: (indices (N, k), distances (N, k)).

    Used by statistical outlier removal and normal estimation. Excluding the
    query itself (for self-neighborhoods) is the caller's job (drop column 0).
    """
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    n = query.shape[0]
    if ref_valid is None:
        ref_valid = jnp.ones(ref.shape[0], bool)
    qpad = _pad_dim(query, chunk, 0)
    blocks = qpad.reshape(-1, chunk, 3)

    def one(qb):
        d2 = _dist2_block(qb, ref)
        d2 = jnp.where(ref_valid[None, :], d2, jnp.inf)
        neg, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), jnp.sqrt(jnp.maximum(-neg, 0.0))

    idx, dist = jax.lax.map(one, blocks)
    return idx.reshape(-1, k)[:n], dist.reshape(-1, k)[:n]


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

try:  # Pallas import is TPU-oriented; keep CPU test environments working.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _nn_kernel(q_ref, r_ref, rvalid_ref, idx_ref, dist_ref, *, ref_tile: int):
    """One query tile vs all reference tiles; running (min, argmin) in VMEM.

    q_ref:     (TQ, 8)      query coordinates (xyz + zero padding)
    r_ref:     (M, 8)       all reference coordinates
    rvalid_ref:(1, M)       validity row
    idx_ref:   (8, TQ/8)    output argmin (row-major flattened per tile)
    dist_ref:  (8, TQ/8)    output min squared distance
    """
    q = q_ref[:]  # (TQ, 8)
    qq = jnp.sum(q * q, axis=1, keepdims=True)  # (TQ, 1)
    m = r_ref.shape[0]
    tq = q.shape[0]
    num_rt = m // ref_tile

    def body(j, carry):
        best_d, best_i = carry
        r = r_ref[pl.ds(j * ref_tile, ref_tile), :]  # (RT, 8)
        rv = rvalid_ref[0, pl.ds(j * ref_tile, ref_tile)]  # (RT,)
        rr = jnp.sum(r * r, axis=1)[None, :]  # (1, RT)
        qr = jnp.dot(q, r.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # MXU, full f32
        d2 = qq + rr - 2.0 * qr  # (TQ, RT)
        d2 = jnp.where(rv[None, :], d2, jnp.inf)
        tile_best = jnp.min(d2, axis=1)  # (TQ,)
        tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + j * ref_tile
        take = tile_best < best_d
        return jnp.where(take, tile_best, best_d), jnp.where(take, tile_arg, best_i)

    init = (jnp.full((tq,), jnp.inf, jnp.float32), jnp.zeros((tq,), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, num_rt, body, init)
    # outputs are tiled (8, TQ/8) to satisfy the TPU (8, 128) layout rule
    idx_ref[:, :] = best_i.reshape(idx_ref.shape)
    dist_ref[:, :] = jnp.maximum(best_d, 0.0).reshape(dist_ref.shape)


@functools.partial(jax.jit, static_argnames=("query_tile", "ref_tile", "interpret"))
def nn_pallas(query, ref, ref_valid=None, query_tile: int = 256,
              ref_tile: int = 2048, interpret: bool = False):
    """Fused nearest-neighbor Pallas kernel. Same contract as `nn_xla`.

    The (TQ, RT) distance tile lives only in VMEM/registers — for the pose
    loss's 1e6x1e3 problem this saves the 4 GB HBM round-trip a materialized
    distance matrix would cost.
    """
    if not _HAS_PALLAS:
        raise RuntimeError("pallas unavailable")
    n = query.shape[0]
    m = ref.shape[0]
    if ref_valid is None:
        ref_valid = jnp.ones(m, bool)

    q8 = _pad_dim(_pad_dim(query.astype(jnp.float32), 8, 1), query_tile, 0)
    r8 = _pad_dim(_pad_dim(ref.astype(jnp.float32), 8, 1), ref_tile, 0)
    rv = _pad_dim(ref_valid.reshape(1, -1), ref_tile, 1, value=False)
    num_qt = q8.shape[0] // query_tile

    grid_spec = pl.GridSpec(
        grid=(num_qt,),
        in_specs=[
            pl.BlockSpec((query_tile, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r8.shape[0], 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rv.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, query_tile // 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, query_tile // 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    idx, d2 = pl.pallas_call(
        functools.partial(_nn_kernel, ref_tile=ref_tile),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_qt * 8, query_tile // 8), jnp.int32),
            jax.ShapeDtypeStruct((num_qt * 8, query_tile // 8), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * q8.shape[0] * r8.shape[0] * 8,
            bytes_accessed=(q8.size + r8.size + 2 * q8.shape[0]) * 4,
            transcendentals=0,
        ),
    )(q8, r8, rv)
    return idx.reshape(-1)[:n], d2.reshape(-1)[:n]


def nn(query, ref, ref_valid=None):
    """Backend-dispatching nearest neighbor (indices, squared distances)."""
    if _HAS_PALLAS and jax.default_backend() == "tpu":
        return nn_pallas(query, ref, ref_valid)
    return nn_xla(query, ref, ref_valid)
