"""Mask-quality attribution for a trained demo's serving front end, CPU-only.

Computes, over the same held-out composite frames attribute_serving serves
(scripts/attribute_serving.heldout_cameras), per class:

  * component IoU — the served CCA component vs the GT instance mask,
  * argmax IoU   — the raw U-Net argmax plane vs the GT instance mask
    (separates U-Net capacity from CCA component selection),

for one or more U-Net decoder out_stride variants (unet.UNet.out_stride) —
the exact build and the relowered serving build share the SAME checkpoint
(identical param tree), so the IoU delta between them isolates the mask
effect of the relowering with no pose noise.

Runs entirely on the CPU backend: the serve-only ADD A/B occupies the chip;
this is the companion evidence line (round-4 VERDICT task 1 discipline:
"seg-model capacity with the seg IoU number attached").

Reference analog: none — the reference never measures its live-path mask
quality (/root/reference/pipeline/utils.py:444-467 picks a component and
moves on).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from attribute_serving import heldout_cameras, iou
from train_multi_demo import MULTI_IMG_HW, SCENE_FAMILIES


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/autopose_famb")
    p.add_argument("--family", default="b", choices=tuple(SCENE_FAMILIES))
    p.add_argument("--frames", type=int, default=36)
    p.add_argument("--strides", default="1,4",
                   help="comma list of UNet out_stride variants to compare")
    p.add_argument("--img-h", type=int, default=MULTI_IMG_HW[0])
    p.add_argument("--img-w", type=int, default=MULTI_IMG_HW[1])
    p.add_argument("--artifact", default="")
    args = p.parse_args()

    from autoposeestimation_tpu.models import unet
    from autoposeestimation_tpu.pipeline import predict
    from autoposeestimation_tpu.train import checkpoints
    from autoposeestimation_tpu.utils import io, synthetic

    img_hw = (args.img_h, args.img_w)
    cfg, objects = SCENE_FAMILIES[args.family](48, img_hw)
    classes = io.read_lines(os.path.join(
        io.dataset_dir(args.out, "pose_estimation", "synth"), "classes.txt"))
    num_obj = len(classes)
    seg_vars = checkpoints.load_checkpoint(os.path.join(
        args.out, "segmentation", "trained_models", "synth",
        "Unet_resnet34.ckpt.npz"))["variables"]

    strides = [int(s) for s in args.strides.split(",") if s]
    cams = heldout_cameras(cfg, args.frames)
    frames = [synthetic.render(cfg, cam, objects) for cam in cams]

    cca_scale, cca_sweeps = 8, 3  # PredictionModels defaults

    def masks_fn(out_stride):
        seg_model = unet.UNet(classes=num_obj + 1, dtype=jnp.bfloat16,
                              out_stride=out_stride)

        @jax.jit
        def run(image):
            probs, pred_arg = predict._segment(seg_model, seg_vars, image)
            cls_ids = jnp.arange(1, num_obj + 1, dtype=jnp.int32)
            planes = jnp.transpose(probs, (2, 0, 1))[1:num_obj + 1]
            comps, found, _ = jax.vmap(
                lambda sp, c: predict._class_mask(
                    sp, pred_arg, c, cca_scale=cca_scale,
                    cca_sweeps=cca_sweeps, seg_stride=out_stride,
                    full_hw=img_hw))(planes, cls_ids)
            return comps, found, predict._upsample_plane(
                pred_arg, out_stride, img_hw)

        return run

    result = {"n_frames": args.frames, "family": args.family,
              "per_stride": {}}
    for s in strides:
        run = masks_fn(s)
        acc = {c: {"component": [], "argmax": [], "found": 0}
               for c in classes}
        for color, _depth, owner in frames:
            comps, found, pred_arg = jax.tree_util.tree_map(
                np.asarray, run(jnp.asarray(color)))
            for i, c in enumerate(classes):
                gt = owner == i
                if found[i]:
                    acc[c]["found"] += 1
                    acc[c]["component"].append(iou(comps[i], gt))
                acc[c]["argmax"].append(iou(pred_arg == i + 1, gt))
        table = {}
        for c in classes:
            table[c] = {
                "found": acc[c]["found"], "of": args.frames,
                "component_iou": round(float(np.mean(acc[c]["component"])), 4)
                if acc[c]["component"] else None,
                "argmax_iou": round(float(np.mean(acc[c]["argmax"])), 4),
            }
        result["per_stride"][str(s)] = table
        print(json.dumps({"out_stride": s, **table}), flush=True)

    if args.artifact:
        io.write_json(args.artifact, result)


if __name__ == "__main__":
    main()
