"""Live training-curve dashboard.

Parity with /root/reference/segmentation/stream_logs.py and
background_subtraction/stream_logs.py: poll the per-epoch JSON log
(rewritten wholesale each epoch by JsonCurveLog) and redraw the curves.

Usage: python scripts/stream_logs.py <path/to/logs.json> [--interval 5]
Falls back to a terminal summary when matplotlib/display is unavailable.
"""
import argparse
import json
import os
import sys
import time


def read_curves(path):
    try:
        with open(path) as f:
            return json.load(f).get("curves", {})
    except (OSError, json.JSONDecodeError):
        return {}


def terminal_summary(curves):
    parts = []
    for key, vals in sorted(curves.items()):
        if vals and isinstance(vals[-1], (int, float)):
            parts.append(f"{key}={vals[-1]:.4g} (n={len(vals)})")
    print(" | ".join(parts) or "(no curves yet)", flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("path")
    parser.add_argument("--interval", type=float, default=5.0)
    parser.add_argument("--once", action="store_true")
    args = parser.parse_args()

    plt = None
    try:
        import matplotlib

        if os.environ.get("DISPLAY") or sys.platform == "darwin":
            import matplotlib.pyplot as plt_mod

            plt = plt_mod
    except Exception:
        plt = None

    while True:
        curves = read_curves(args.path)
        if plt is not None and curves:
            plt.clf()
            for key, vals in sorted(curves.items()):
                if vals and isinstance(vals[0], (int, float)):
                    plt.plot(vals, label=key)
            plt.legend(fontsize=7)
            plt.xlabel("epoch")
            plt.pause(0.01)
        else:
            terminal_summary(curves)
        if args.once:
            return
        time.sleep(args.interval)


if __name__ == "__main__":
    main()
