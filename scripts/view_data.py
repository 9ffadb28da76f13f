"""Acquisition data viewer — parity with /root/reference/data_generation/test.py:
plot color/depth pairs of a run (or dump panels headlessly).

Usage: python scripts/view_data.py <root> <object> [run] [--dump-dir DIR]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autoposeestimation_tpu.utils import io  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("root")
    parser.add_argument("object")
    parser.add_argument("run", nargs="?", default="foreground")
    parser.add_argument("--dump-dir", default=None)
    args = parser.parse_args()

    run_dir = os.path.join(io.data_dir(args.root), args.object, args.run)
    for stem in io.list_sample_ids(run_dir):
        color = io.read_color(os.path.join(run_dir, stem + ".color.png"))
        depth = io.read_depth(os.path.join(run_dir, stem + ".depth.png"))
        dmax = max(float(depth.max()), 1.0)
        depth_vis = np.repeat(
            (depth.astype(np.float64) / dmax * 255).astype(np.uint8)[..., None],
            3, axis=-1)
        panel = np.concatenate([color, depth_vis], axis=1)
        if args.dump_dir:
            io.write_png(os.path.join(args.dump_dir, stem + ".panel.png"),
                         panel)
        else:
            import matplotlib.pyplot as plt

            plt.imshow(panel)
            plt.title(stem)
            plt.pause(0.5)


if __name__ == "__main__":
    main()
