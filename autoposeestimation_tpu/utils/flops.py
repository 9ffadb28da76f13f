"""Honest per-graph FLOP counts for MFU reporting.

The axon TPU plugin's `compile().cost_analysis()["flops"]` inflates conv
FLOPs ~4x (cross-checked against an analytic count of the U-Net encoder),
so MFU numbers derived from it are meaningless. This module counts FLOPs of
a named graph on the CPU backend — whose cost analysis matches analytic
counts — in a subprocess (the TPU backend may already own this process),
and caches the result keyed by the graph's config under
`artifacts/flops_cache.json`.

Usage: `cached_flops("serving_graph")` from bench scripts;
`python -m autoposeestimation_tpu.utils.flops <name>` is the subprocess
entry (forces the CPU platform before building anything).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_CACHE = os.path.join(_REPO, "artifacts", "flops_cache.json")

# Single source of truth for the benchmarked graph shapes: bench.py and the
# graph builders below both read these, and the cache key includes them —
# editing a config invalidates the cached FLOP count (r2 ADVICE: a
# name-only key silently served stale MFU numbers).
GRAPH_CONFIGS = {
    "serving_graph": dict(num_classes=5, num_points=1000, crop=320, h=480,
                          w=640, refine_iters=2, emb_stride=8),
    "serving_graph_exact": dict(num_classes=5, num_points=1000, crop=320,
                                h=480, w=640, refine_iters=2, emb_stride=1),
    "serving_graph_s2": dict(num_classes=5, num_points=1000, crop=320,
                             h=480, w=640, refine_iters=2, emb_stride=2),
    # the round-5 U-Net decoder relowering (unet.UNet.out_stride=4): same
    # pose path, seg decoder's last blocks on the /4 lattice
    "serving_graph_u4": dict(num_classes=5, num_points=1000, crop=320,
                             h=480, w=640, refine_iters=2, emb_stride=8,
                             seg_out_stride=4),
    "serving_graph_s2_u4": dict(num_classes=5, num_points=1000, crop=320,
                                h=480, w=640, refine_iters=2, emb_stride=2,
                                seg_out_stride=4),
    "densefusion_train_step": dict(batch=8, n=1000, m=500, crop=320,
                                   num_obj=5),
}

# cumulative prefixes of the headline serving graph (shared builders in
# utils/serving_stages.py — the SAME step functions bench_prefix times on
# the chip; stage FLOPs = consecutive diffs)
for _p in ("seg", "seg_cca", "perclass", "estimator", "full"):
    GRAPH_CONFIGS[f"serving_prefix_{_p}"] = dict(
        num_classes=5, num_points=1000, crop=320, h=480, w=640,
        refine_iters=2, emb_stride=8, prefix=_p)
    # the same prefixes with the relowered U-Net decoder (out_stride=4)
    GRAPH_CONFIGS[f"serving_prefix_{_p}_u4"] = dict(
        num_classes=5, num_points=1000, crop=320, h=480, w=640,
        refine_iters=2, emb_stride=8, seg_out_stride=4, prefix=_p)

# train-step stages (shared builders in utils/train_stages.py — the same
# graphs bench_prefix times; m follows DFConfig.num_points_mesh)
for _t in ("pspnet_fwd", "posenet_fwd", "symloss_fwd", "symloss_fwd_bwd",
           "estimator_step", "estimator_step_symbf16", "refiner_step"):
    GRAPH_CONFIGS[f"train_stage_{_t}"] = dict(
        num_obj=5, bs=8, n=1000, m=500, crop=320, stage=_t)


def _build_serving_graph(name: str = "serving_graph"):
    """The bench.py headline graph: fused full_prediction, 640x480, 5 obj.
    `serving_graph_exact` is the same graph at the reference-exact
    emb_stride=1 (bench_extra's exact-path line)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..pipeline import predict

    cfg = GRAPH_CONFIGS[name]
    rng = np.random.default_rng(0)
    model_points = rng.normal(
        size=(cfg["num_classes"], 1000, 3)).astype(np.float32) * 0.05
    models = predict.build_models(
        num_classes_fg=cfg["num_classes"], model_points=model_points,
        classes=tuple(f"obj{i}" for i in range(cfg["num_classes"])),
        num_points=cfg["num_points"], crop=cfg["crop"],
        refine_iters=cfg["refine_iters"], dtype=jnp.bfloat16,
        img_hw=(cfg["h"], cfg["w"]), emb_stride=cfg["emb_stride"],
        seg_out_stride=cfg.get("seg_out_stride", 1))
    static = predict.static_tuple(models)
    # image/depth must be function ARGS, not closed-over constants: XLA
    # constant-folds whole U-Net stages fed by constants out of the
    # compiled module, and cost_analysis() then UNDERCOUNTS the graph the
    # benches actually run (observed: 342.7 vs the true 386.4 GFLOP at
    # stride 8 — bench.py passes device arrays, so its graph keeps every
    # conv). Folding the 640x480 graph also takes minutes of compile time.
    image = jnp.zeros((cfg["h"], cfg["w"], 3), jnp.uint8)
    depth = jnp.full((cfg["h"], cfg["w"]), 700.0, jnp.float32)
    intr = jnp.asarray([600.0, 600.0, 320.0, 240.0], jnp.float32)

    def run(image, depth, key):
        return predict._full_prediction_jit(
            models.seg_vars, models.pose_vars, models.refine_vars,
            image, depth, intr, jnp.float32(0.001), key, static)

    return run, (image, depth, jax.random.PRNGKey(0)), cfg


def _build_densefusion_train_step():
    """bench_extra's estimator training step: bs 8, 1000 pts, sym loss."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..train import densefusion as dft

    cfg = GRAPH_CONFIGS["densefusion_train_step"]
    dcfg = dft.DFConfig(num_points=cfg["n"], num_points_mesh=cfg["m"])
    state = dft.create_trainer(cfg["num_obj"], dcfg, crop=cfg["crop"],
                               dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    b, n, m, crop = cfg["batch"], cfg["n"], cfg["m"], cfg["crop"]
    batch = {
        "img": jnp.asarray(rng.normal(size=(b, crop, crop, 3)), jnp.float32),
        "cloud": jnp.asarray(rng.normal(size=(b, n, 3)) * 0.05, jnp.float32),
        "choose": jnp.asarray(rng.integers(0, crop * crop, (b, n)), jnp.int32),
        "target": jnp.asarray(rng.normal(size=(b, m, 3)) * 0.05, jnp.float32),
        "model_points": jnp.asarray(rng.normal(size=(b, m, 3)) * 0.05,
                                    jnp.float32),
        "obj_idx": jnp.asarray(rng.integers(0, cfg["num_obj"], b), jnp.int32),
        "is_sym": jnp.asarray(rng.integers(0, 2, b), bool),
        "dropout_rng": jax.random.PRNGKey(0),
    }

    def run(pose_vars, opt_state):
        return dft.estimator_step(pose_vars, opt_state, batch,
                                  jnp.float32(dcfg.w), state.posenet,
                                  state.tx, with_sym=True)

    return run, (state.pose_vars, state.opt_state), cfg


def _build_serving_prefix(name: str):
    """One cumulative prefix of the serving graph (utils/serving_stages.py);
    the graph is the scan STEP bench_prefix times, called once."""
    import jax.numpy as jnp

    from . import serving_stages

    cfg = dict(GRAPH_CONFIGS[name])
    prefix = cfg.pop("prefix")
    steps, _ = serving_stages.build_prefixes(**cfg)

    def run(c):
        return steps[prefix](c, jnp.uint32(0))

    return run, (jnp.uint8(0),), GRAPH_CONFIGS[name]


_GRAPHS = {
    "serving_graph": _build_serving_graph,
    "serving_graph_exact": lambda: _build_serving_graph(
        "serving_graph_exact"),
    "serving_graph_s2": lambda: _build_serving_graph("serving_graph_s2"),
    "serving_graph_u4": lambda: _build_serving_graph("serving_graph_u4"),
    "serving_graph_s2_u4": lambda: _build_serving_graph(
        "serving_graph_s2_u4"),
    "densefusion_train_step": _build_densefusion_train_step,
}
for _p in ("seg", "seg_cca", "perclass", "estimator", "full"):
    for _suffix in ("", "_u4"):
        _name = f"serving_prefix_{_p}{_suffix}"
        _GRAPHS[_name] = (lambda n=_name: _build_serving_prefix(n))


def _build_train_stage(name: str):
    import jax.numpy as jnp

    from . import train_stages

    cfg = dict(GRAPH_CONFIGS[name])
    stage = cfg.pop("stage")
    steps, carries = train_stages.build_stages(**cfg)

    def run(carry):
        return steps[stage](carry, jnp.uint32(0))

    return run, (carries[stage],), GRAPH_CONFIGS[name]


for _t in ("pspnet_fwd", "posenet_fwd", "symloss_fwd", "symloss_fwd_bwd",
           "estimator_step", "estimator_step_symbf16", "refiner_step"):
    _name = f"train_stage_{_t}"
    _GRAPHS[_name] = (lambda n=_name: _build_train_stage(n))


def _count(name: str) -> float:
    import jax

    run, args, _ = _GRAPHS[name]()
    ca = jax.jit(run).lower(*args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float(ca.get("flops", 0.0))


def cached_flops(name: str, timeout: int = 1800):
    """FLOPs of the named graph, from cache or a CPU-backend subprocess.
    Returns None on failure (callers omit the MFU line). The cache key is
    name + the graph config, so shape edits re-count instead of silently
    reusing stale numbers."""
    key = name + ":" + json.dumps(GRAPH_CONFIGS.get(name, {}),
                                  sort_keys=True)
    try:
        with open(_CACHE) as f:
            cache = json.load(f)
        if key in cache:
            return float(cache[key])
    except Exception:
        cache = {}
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "autoposeestimation_tpu.utils.flops",
             name],
            capture_output=True, text=True, timeout=timeout, cwd=_REPO)
        if proc.returncode != 0:
            return None
        flops = float(proc.stdout.strip().splitlines()[-1])
    except Exception:
        return None
    cache[key] = flops
    os.makedirs(os.path.dirname(_CACHE), exist_ok=True)
    with open(_CACHE, "w") as f:
        json.dump(cache, f, indent=1)
    return flops


if __name__ == "__main__":
    import jax

    # the axon plugin ignores JAX_PLATFORMS; the explicit update is required
    jax.config.update("jax_platforms", "cpu")
    print(_count(sys.argv[1]))
