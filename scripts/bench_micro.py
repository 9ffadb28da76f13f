"""Focused TPU microbenches for the round-3 hot spots: CCA variants and the
sym-loss kernels. Scan-serialized, one JSON line each."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench_prefix import scan_time, emit  # noqa: E402  (same dir)


def main():
    from autoposeestimation_tpu.models import losses
    from autoposeestimation_tpu.ops import cca as cca_ops
    from autoposeestimation_tpu.ops import pallas_addloss as pa
    from autoposeestimation_tpu.pipeline import predict
    from autoposeestimation_tpu.utils import synthetic, transforms as T

    t0 = time.perf_counter()
    _ = np.asarray(jnp.ones((256, 256)) @ jnp.ones((256, 256)))
    emit("probe", time.perf_counter() - t0)

    # --- CCA variants ----------------------------------------------------
    h, w, k_fg = 480, 640, 5
    rng = np.random.default_rng(0)
    cfg = synthetic.SynthConfig(img_h=h, img_w=w, fx=600.0, fy=600.0,
                                ring_radius=500.0, ring_height=450.0)
    spheres = [
        synthetic.SphereObject(
            f"obj{i}",
            np.asarray([120.0 * np.cos(a), 120.0 * np.sin(a), 40.0]),
            45.0, tuple(int(v) for v in rng.integers(60, 255, 3)))
        for i, a in enumerate(np.linspace(0, 2 * np.pi, k_fg,
                                          endpoint=False))]
    cam = synthetic.ring_cameras(cfg, np.zeros(3))[0]
    _, _, labels = synthetic.render(cfg, cam, spheres)
    pred_arg = jnp.asarray(labels.astype(np.int32))
    score = jnp.asarray(rng.random((h, w)), jnp.float32)
    cls_ids = jnp.arange(1, k_fg + 1, dtype=jnp.int32)

    def cca_step(scale, sweeps):
        def step(c, i):
            pa_ = pred_arg + c

            def one(cl):
                m = pa_ == cl
                comp, f = cca_ops.best_component_mask(
                    m, score, rule="mean_float", scale=scale,
                    fixed_sweeps=sweeps)
                return comp, f
            masks, found = jax.vmap(one)(cls_ids)
            return (masks.sum() * 0).astype(jnp.int32), found
        return step

    for scale in (4, 8):
        for sweeps in (0, 3):
            emit(f"cca5_scale{scale}_sweeps{sweeps}",
                 scan_time(cca_step(scale, sweeps), jnp.int32(0)))

    # --- sym-loss kernels ------------------------------------------------
    n, m = 1000, 1000
    quat = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    trans = jnp.asarray(rng.normal(size=(n, 3)) * 0.01, jnp.float32)
    points = jnp.asarray(rng.normal(size=(n, 3)) * 0.1, jnp.float32)
    model = jnp.asarray(rng.normal(size=(m, 3)) * 0.05, jnp.float32)
    target = jnp.asarray(rng.normal(size=(m, 3)) * 0.05, jnp.float32)

    def sym_fwd1(c, i):
        d, s = pa.sym_moments(quat + c, trans, points, model, target)
        return (d.sum() * 0).astype(jnp.float32), d[0]
    emit("sym_moments_fwd_n1000", scan_time(sym_fwd1, jnp.float32(0)))

    bq = jnp.broadcast_to(quat, (8, n, 4))
    bt = jnp.broadcast_to(trans, (8, n, 3))
    bp = jnp.broadcast_to(points, (8, n, 3))
    bm = jnp.broadcast_to(model, (8, m, 3))
    btg = jnp.broadcast_to(target, (8, m, 3))

    def sym_fwd8(c, i):
        d, s = jax.vmap(lambda a, b, c2, d2, e: pa.sym_moments(
            a, b, c2, d2, e))(bq + c, bt, bp, bm, btg)
        return (d.sum() * 0).astype(jnp.float32), d[0, 0]
    emit("sym_moments_fwd_vmap8", scan_time(sym_fwd8, jnp.float32(0)))

    def sym_bwd8(c, i):
        def f(q, t, p):
            d, s = jax.vmap(lambda a, b, c2, d2, e: pa.sym_moments(
                a, b, c2, d2, e))(q, t, p, bm, btg)
            return jnp.sum(d) + jnp.sum(s)
        g = jax.grad(f, argnums=(0, 1, 2))(bq + c, bt, bp)
        return (g[0].sum() * 0).astype(jnp.float32), g[0][0, 0, 0]
    emit("sym_moments_fwd_bwd_vmap8", scan_time(sym_bwd8, jnp.float32(0)))

    # non-sym dense branch (what pose_loss computes for every sample)
    def nonsym8(c, i):
        def one(q, t, p):
            rot = T.quat_to_mat(q)
            pred = jnp.einsum("mj,nij->nmi", model, rot,
                              precision=jax.lax.Precision.HIGHEST)
            pred = pred + (p + t)[:, None, :]
            per = jnp.linalg.norm(pred - target[None], axis=2)
            return jnp.mean(per, axis=1), jnp.std(per, axis=1, ddof=1)
        d, s = jax.vmap(one)(bq + c, bt, bp)
        return (d.sum() * 0).astype(jnp.float32), d[0, 0]
    emit("nonsym_dense_vmap8", scan_time(nonsym8, jnp.float32(0)))

    # full pose_loss fwd+bwd (both branches + where)
    bc = jnp.abs(jnp.asarray(rng.normal(size=(8, n)), jnp.float32))
    bsym = jnp.asarray([True, False] * 4)

    def ploss(c, i):
        def f(q, t):
            out = losses.pose_loss(q, t, bc, btg, bm, bp, bsym, w=0.015,
                                   with_sym=True)
            return out.loss
        g = jax.grad(f, argnums=(0, 1))(bq + c, bt)
        return (g[0].sum() * 0).astype(jnp.float32), g[0][0, 0, 0]
    emit("pose_loss_fwd_bwd_vmap8", scan_time(ploss, jnp.float32(0)))


if __name__ == "__main__":
    main()
