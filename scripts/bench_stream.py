"""Host serving-loop throughput lines only (a fast standalone cut of
scripts/bench_extra.py's serve_stream section, for iterating on the loop
without the full extended suite).

Measures on the real chip, headline geometry (640x480, 5 classes,
random-init weights — the loop's cost is weight-independent):
  * blocking host loop (dispatch -> wait -> readback per frame),
  * dispatch-ahead (in_flight=6),
  * batched dispatch (batch=8, in_flight=2) — 8 frames per device call
    through the batched graph, amortizing the per-dispatch RPC cost,
  * the raw tunnel dispatch+readback RTT for attribution.

Prints one JSON object per metric, one per line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def emit(metric, value, unit, baseline=None):
    rec = {"metric": metric, "value": round(float(value), 3), "unit": unit}
    if baseline:
        rec["vs_baseline"] = round(float(value) / baseline, 3)
    print(json.dumps(rec), flush=True)


def main():
    from autoposeestimation_tpu.pipeline import predict
    from autoposeestimation_tpu.utils import synthetic

    n_frames = 64
    for a in sys.argv[1:]:
        if a.startswith("--frames="):
            n_frames = int(a.split("=", 1)[1])

    # liveness probe FIRST (before any big compile): one tiny
    # dispatch+readback round-trip, also the attribution line
    ready = jnp.zeros((16,), jnp.float32) + 1
    _ = np.asarray(ready)
    t0 = time.perf_counter()
    for _ in range(30):
        _ = np.asarray(ready + 0)
    rtt = (time.perf_counter() - t0) / 30
    emit("tunnel_dispatch_readback_rtt_ms", rtt * 1000, "ms")

    # link BANDWIDTH both ways (the serving frames are ~1.5 MB/frame on the
    # wire; a degraded-uplink tunnel phase makes every host-loop number a
    # link measurement, not a software one — these two lines prove which
    # regime the session is in and feed the local-deployment derivation)
    big = np.zeros((4 << 20,), np.uint8)  # 4 MB
    for _ in range(2):
        d = jax.device_put(big)
        d.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        jax.device_put(big).block_until_ready()
    h2d = 3 * big.nbytes / (time.perf_counter() - t0)
    emit("tunnel_h2d_bandwidth_mb_s", h2d / 1e6, "MB/s")
    t0 = time.perf_counter()
    for _ in range(3):
        _ = np.asarray(d)
    d2h = 3 * big.nbytes / (time.perf_counter() - t0)
    emit("tunnel_d2h_bandwidth_mb_s", d2h / 1e6, "MB/s")
    # per-frame wire cost of the no-masks serving uplink: u8 RGB + u16 depth
    wire_mb = (640 * 480 * 3 + 640 * 480 * 2) / 1e6
    emit("wire_seconds_per_frame_u16", wire_mb * 1e6 / h2d, "s")

    rng = np.random.default_rng(0)
    num_classes = 5
    cfg2 = synthetic.SynthConfig(img_h=480, img_w=640, fx=600.0, fy=600.0,
                                 ring_radius=500.0, ring_height=450.0)
    spheres = [synthetic.SphereObject(
        f"o{i}", np.asarray([120.0 * np.cos(a), 120.0 * np.sin(a), 40.0]),
        45.0, tuple(int(v) for v in rng.integers(60, 255, 3)))
        for i, a in enumerate(np.linspace(0, 2 * np.pi, num_classes,
                                          endpoint=False))]
    cams = synthetic.ring_cameras(cfg2, np.zeros(3))
    frames = [synthetic.render(cfg2, cams[i % len(cams)], spheres)
              for i in range(8)]
    models = predict.build_models(
        num_classes, rng.normal(size=(num_classes, 1000, 3)).astype(
            np.float32) * 0.05,
        tuple(f"o{i}" for i in range(num_classes)), num_points=1000,
        crop=320, refine_iters=2, dtype=jnp.bfloat16, img_hw=(480, 640))

    meta_s = {"intr": {"fx": 600.0, "fy": 600.0, "ppx": 320.0, "ppy": 240.0},
              "depth_scale": 0.001}
    frame_list = [(np.asarray(frames[i % 8][0]),
                   np.asarray(frames[i % 8][1]), meta_s)
                  for i in range(n_frames)]

    # warm both graphs (compile outside the timed regions)
    for _r in predict.serve_stream(iter(frame_list[:2]), models,
                                   in_flight=0, want_masks=False,
                                   key=jax.random.PRNGKey(0)):
        pass
    for _r in predict.serve_stream(iter(frame_list[:8]), models,
                                   in_flight=0, want_masks=False, batch=8,
                                   key=jax.random.PRNGKey(0)):
        pass

    for kwargs, label in (
            (dict(in_flight=0), "blocking"),
            (dict(in_flight=6), "inflight6"),
            (dict(in_flight=2, batch=8), "batch8_inflight2")):
        n_got = 0
        t0 = time.perf_counter()
        for _r in predict.serve_stream(iter(frame_list), models,
                                       want_masks=False,
                                       key=jax.random.PRNGKey(0), **kwargs):
            n_got += 1
        dt_all = time.perf_counter() - t0
        emit(f"serve_stream_fps_640x480_{label}_nomasks",
             n_got / dt_all, "frames/sec", 30.0)

    # raw-dtype depth uplink: the graphs cast on device, so uint16 camera
    # frames upload at half the depth bytes (2 vs 4 B/px)
    u16_list = [(im, d.astype(np.uint16), m) for im, d, m in frame_list]
    for _r in predict.serve_stream(iter(u16_list[:8]), models, in_flight=0,
                                   want_masks=False, batch=8,
                                   key=jax.random.PRNGKey(0)):
        pass  # warm the uint16-signature compilation
    n_got = 0
    t0 = time.perf_counter()
    for _r in predict.serve_stream(iter(u16_list), models, in_flight=2,
                                   want_masks=False, batch=8,
                                   key=jax.random.PRNGKey(0)):
        n_got += 1
    emit("serve_stream_fps_640x480_batch8_inflight2_u16depth_nomasks",
         n_got / (time.perf_counter() - t0), "frames/sec", 30.0)


if __name__ == "__main__":
    main()
