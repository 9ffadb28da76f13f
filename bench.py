"""Benchmark: end-to-end fused full-prediction throughput on the real chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference live pipeline targets the RealSense's 30 fps at
640x480 (BASELINE.md "north star": >= 30 RGB-D fps/chip). vs_baseline is
measured fps / 30.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from autoposeestimation_tpu.utils.flops import GRAPH_CONFIGS

_CONFIG = GRAPH_CONFIGS["serving_graph"]


def _wait_for_tpu(max_wait_s: float = 600.0) -> bool:
    """The tunneled TPU occasionally wedges (tiny ops hang for many minutes;
    CLAUDE.md). Probe with a tiny matmul in a SUBPROCESS — a hung probe can
    be killed, unlike an in-process hung dispatch — and wait briefly for
    recovery before this process commits its own TPU client to the run."""
    import subprocess

    code = ("import jax, jax.numpy as jnp;"
            "(jnp.ones((128, 128)) @ jnp.ones((128, 128)))"
            ".block_until_ready(); print('probe-ok')")
    deadline = time.time() + max_wait_s
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", code], timeout=150,
                               capture_output=True, text=True)
            if "probe-ok" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            print("warning: device probe still failing after "
                  f"{max_wait_s:.0f}s (wedged tunnel?); proceeding anyway",
                  file=sys.stderr)
            return False
        print("device probe failed; waiting for the tunnel to recover...",
              file=sys.stderr)
        time.sleep(60)


def main():
    _wait_for_tpu()
    from autoposeestimation_tpu.pipeline import predict

    num_classes = _CONFIG["num_classes"]
    num_points = _CONFIG["num_points"]
    crop = _CONFIG["crop"]
    h, w = _CONFIG["h"], _CONFIG["w"]
    refine_iters = _CONFIG["refine_iters"]

    # a structured 5-object tabletop frame (ray-traced) so the per-class CCA,
    # choose and crop stages do representative work — noise frames make CCA
    # degenerate. Scene single-sourced in utils/synthetic.headline_scene
    # (scripts/train_bench_seg.py fits the seg net on this exact scene for
    # the trained-masks confirmation line in scripts/bench_extra.py).
    from autoposeestimation_tpu.utils import synthetic

    cfg, spheres, model_points = synthetic.headline_scene(
        num_classes=num_classes, img_hw=(h, w))
    models = predict.build_models(
        num_classes_fg=num_classes, model_points=model_points,
        classes=tuple(f"obj{i}" for i in range(num_classes)),
        num_points=num_points, crop=crop, refine_iters=refine_iters,
        dtype=jnp.bfloat16, img_hw=(h, w), emb_stride=_CONFIG["emb_stride"],
        seg_out_stride=_CONFIG.get("seg_out_stride", 1))

    static = predict.static_tuple(models)

    cam = synthetic.ring_cameras(cfg, np.zeros(3))[0]
    image, depth, _ = synthetic.render(cfg, cam, spheres)
    depth = depth.astype(np.float32)
    image_d = jax.device_put(jnp.asarray(image))
    depth_d = jax.device_put(jnp.asarray(depth))
    intr = jnp.asarray([600.0, 600.0, 320.0, 240.0], jnp.float32)
    key = jax.random.PRNGKey(0)

    def run(k):
        return predict._full_prediction_jit(
            models.seg_vars, models.pose_vars, models.refine_vars,
            image_d, depth_d, intr, jnp.float32(0.001), k, static)

    # Trustworthy timing through the tunnel (round-1 recorded 3-6x past the
    # bf16 roofline with the naive dispatch loop + block_until_ready, and
    # eager host-side chaining measures RPC latency instead): run the whole
    # trial as ONE jitted lax.scan whose per-frame key depends on the
    # previous frame's output — serialized real compute on device, a single
    # dispatch, and a host readback of the poses that cannot lie.
    iters = 30

    @jax.jit
    def run_many(keys):
        def step(carry, k):
            out = run(k + carry)
            c2 = jnp.broadcast_to(
                (jnp.abs(out["positions"]).sum() * 0).astype(jnp.uint32),
                (2,))
            return c2, out["positions"]
        _, ps = jax.lax.scan(
            step, jnp.zeros((2,), jnp.uint32), keys)
        return ps

    all_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(iters, dtype=jnp.uint32))
    _ = np.asarray(run_many(all_keys))  # warmup/compile + readback

    n_trials = 5
    trials = []
    for t in range(n_trials):
        keys_t = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(t * iters, (t + 1) * iters, dtype=jnp.uint32))
        t0 = time.perf_counter()
        _ = np.asarray(run_many(keys_t))  # host readback: real bytes
        trials.append(iters / (time.perf_counter() - t0))
    fps = sorted(trials)[n_trials // 2]

    # model FLOP utilization of the fused serving graph (CPU-backend-counted
    # FLOPs / measured time / chip peak) — round-1 VERDICT weakness #5
    mfu = None
    try:
        from autoposeestimation_tpu.utils.flops import cached_flops
        flops = cached_flops("serving_graph")
        kind = jax.devices()[0].device_kind.lower()
        peak = 197e12 if "v5" in kind else (275e12 if "v6" in kind else None)
        if flops and peak:
            mfu = flops * fps / peak * 100.0
    except Exception:
        pass

    entry = {
        "metric": "full_prediction_fps_640x480_5obj",
        "value": round(fps, 2),
        "method": "scan-serialized per-frame dependence + host readback",
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 3),
        "spread": {"min": round(min(trials), 2), "max": round(max(trials), 2),
                   "trials": n_trials, "iters_per_trial": iters},
        "mfu_pct": round(mfu, 3) if mfu is not None else None,
    }
    if mfu is not None and mfu > 100.0:
        entry["note"] = ("mfu > 100% of bf16 peak: measured fps exceeds the "
                         "roofline for the CPU-counted graph FLOPs — treat "
                         "the fps sample as a timing/clock anomaly")
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
