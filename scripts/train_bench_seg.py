"""Fit the headline benchmark's segmentation U-Net on its exact scene.

The headline bench (bench.py) measures random-init networks, so argmax masks
are speckle and the CCA/crop stages do bounded-worst-case rather than
tabletop-representative work (round-2 VERDICT weak #6). The demo's trained
line (scripts/bench_extra.py) confirms the stage mix with coherent masks but
at the demo geometry (256x320, 1 object). This script closes the remaining
gap: it briefly fits the 6-class U-Net on the headline scene itself
(utils/synthetic.headline_scene — the bench frame is camera 0 of the ring)
and saves the checkpoint to /tmp/autopose_benchseg/; bench_extra then emits
`full_prediction_fps_trainedseg_640x480_5obj`, replaying bench.py's exact
scan-serialized method with coherent masks AT the headline geometry.

Pose/refine weights stay random-init on purpose: the pose stage is
weight-independent in cost (static shapes, fixed 5-slot batch); mask
coherence is the only thing that changes the stage mix. Reference analog:
the live loop this all measures, /root/reference/pipeline/utils.py:410-641.

Runtime: ~2-5 min on the tunneled TPU (or ~20 min CPU).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OUT_DIR = "/tmp/autopose_benchseg"


def build_frames(num_classes: int, img_hw):
    """Render the headline scene from camera rings at three heights (the
    bench frame itself = ring_height 450, camera 0)."""
    from autoposeestimation_tpu.utils import synthetic

    cfg, spheres, _ = synthetic.headline_scene(num_classes, img_hw)
    images, labels = [], []
    for height in (380.0, 450.0, 520.0):
        c = synthetic.SynthConfig(
            img_h=cfg.img_h, img_w=cfg.img_w, fx=cfg.fx, fy=cfg.fy,
            n_viewpoints=12, ring_radius=cfg.ring_radius, ring_height=height)
        for cam in synthetic.ring_cameras(c, np.zeros(3)):
            image, _, owner = synthetic.render(c, cam, spheres)
            images.append(image)
            labels.append((owner + 1).astype(np.int32))
    return np.stack(images), np.stack(labels)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--max-steps", type=int, default=300)
    parser.add_argument("--target-miou", type=float, default=0.97,
                        help="foreground mIoU on the bench frame that stops "
                             "training early")
    parser.add_argument("--batch-size", type=int, default=4)
    args = parser.parse_args()

    from autoposeestimation_tpu.models.common import normalize_imagenet
    from autoposeestimation_tpu.train import checkpoints as ckpt
    from autoposeestimation_tpu.train import segmentation as segtrain
    from autoposeestimation_tpu.utils.flops import GRAPH_CONFIGS

    hcfg = GRAPH_CONFIGS["serving_graph"]
    num_classes = hcfg["num_classes"]
    img_hw = (hcfg["h"], hcfg["w"])

    images, labels = build_frames(num_classes, img_hw)
    n_frames = len(images)
    print(f"rendered {n_frames} frames at {img_hw}", flush=True)

    cfg = segtrain.SegConfig(classes=num_classes + 1,
                             batch_size=args.batch_size)
    model = segtrain.build_model(cfg, dtype=jnp.bfloat16)
    tx = segtrain.make_tx(cfg)
    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1,) + img_hw + (3,))))
    opt_state = tx.init(variables["params"])

    # the bench frame: ring_height 450 block starts at index 12
    bench_img = jnp.asarray(images[12])
    bench_lbl = labels[12]

    @jax.jit
    def eval_miou(variables):
        logits = model.apply(variables, normalize_imagenet(bench_img)[None])[0]
        pred = jnp.argmax(logits, axis=-1)
        ious = []
        for c in range(1, num_classes + 1):
            p, t = pred == c, jnp.asarray(bench_lbl == c)
            ious.append(jnp.sum(p & t) / jnp.maximum(jnp.sum(p | t), 1))
        return jnp.stack(ious)

    rng = np.random.default_rng(1)
    t0 = time.time()
    miou = 0.0
    step = 0
    for step in range(1, args.max_steps + 1):
        pick = rng.integers(0, n_frames, args.batch_size)
        batch = {
            "image": normalize_imagenet(jnp.asarray(images[pick])),
            "label": jnp.asarray(labels[pick]),
        }
        variables, opt_state, metrics = segtrain.train_step(
            variables, opt_state, batch, model, tx, num_classes + 1)
        if step % 25 == 0 or step == args.max_steps:
            ious = np.asarray(eval_miou(variables))
            miou = float(ious.mean())
            print(f"step {step}: loss={float(metrics['loss']):.4f} "
                  f"bench-frame fg mIoU={miou:.4f}", flush=True)
            if miou >= args.target_miou:
                break

    os.makedirs(OUT_DIR, exist_ok=True)
    ckpt.save_checkpoint(
        os.path.join(OUT_DIR, "Unet_benchscene"), variables,
        meta={"steps": step, "bench_frame_fg_miou": miou,
              "num_classes_fg": num_classes, "img_hw": list(img_hw),
              "train_seconds": round(time.time() - t0, 1)})
    print(json.dumps({"saved": os.path.join(OUT_DIR, "Unet_benchscene.npz"),
                      "steps": step, "bench_frame_fg_miou": round(miou, 4),
                      "seconds": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
