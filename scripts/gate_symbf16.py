"""Promotion gate for ``DFConfig.sym_bf16`` (bf16 distance matmuls in the
fused sym train kernel, 70.4 vs 79.7 ms estimator step).

The gate is the sym_bf16 TWIN of the multi-object flagship demo
(``scripts/train_multi_demo.py --sym-bf16``): same 5-object scene (one
symmetric class), same trainer, only the kernel arithmetic differs. This
script compares the twin's artifact + curves against the exact-arithmetic
flagship run (``artifacts/demo_multi_round5.json`` + ``_curves.json``) and
emits one JSON verdict line.

A twin trained for FEWER epochs than the flagship's 120 is compared against
the flagship's best-so-far at the same epoch (the per-epoch ``test_dists``
curve), not its final number — a 60-epoch twin must match what exact
arithmetic had achieved by epoch 60.

Checks (all must hold):
  1. refine phase reached; decay AND refine transitions fired by margin
     (the demo's health signature — fallback triggers mean the optimizer
     crawled).
  2. ``grad_norm_max`` over all epochs <= 10 (exact run: 4.7; the
     pre-round-4 numerical bugs announced themselves at 1e4-2e5).
  3. best test ADD within ``--tol-add-mm`` (default 1.5) of the exact
     run's best-so-far at the twin's epoch budget.
  4. serving: every class found in every held-out composite frame, and
     per-class ADD(-S) within ``--tol-serve-mm`` (default 3.0) of the
     exact run's per-class table (run-to-run training noise included).

Reference analog for the A/B discipline: the round-3 stride-8 promotion
gate, which round 4 tightened to ADD after the translation-only version
missed a symmetric-class regression.
"""
import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ART = os.path.join(os.path.dirname(HERE), "artifacts")


def _load(path):
    with open(path) as f:
        return json.load(f)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exact", default=os.path.join(ART, "demo_multi_round5.json"))
    p.add_argument("--exact-curves",
                   default=os.path.join(ART, "demo_multi_round5_curves.json"))
    p.add_argument("--twin",
                   default=os.path.join(ART, "demo_multi_round5_symbf16.json"))
    p.add_argument("--twin-curves",
                   default=os.path.join(ART,
                                        "demo_multi_round5_symbf16_curves.json"))
    p.add_argument("--tol-add-mm", type=float, default=1.5)
    p.add_argument("--tol-serve-mm", type=float, default=3.0)
    p.add_argument("--exact-serve", default=None,
                   help="attribute_serving.py artifact for the EXACT run "
                        "(n>=36 held-out frames); with --twin-serve, the "
                        "serving check compares these served_s* tables "
                        "instead of the demo artifacts' n=9 ones")
    p.add_argument("--twin-serve", default=None,
                   help="attribute_serving.py --serve-only artifact for the "
                        "sym_bf16 twin on the same held-out frames")
    args = p.parse_args()

    if os.path.abspath(args.exact) == os.path.abspath(args.twin):
        print(json.dumps({"gate": "sym_bf16_promotion", "error":
                          "--exact and --twin are the same file; the twin "
                          "run must write its own artifact"}))
        return 2

    exact, twin = _load(args.exact), _load(args.twin)
    exact_td = _load(args.exact_curves)["curves"]["test_dists"]
    twin_curves = _load(args.twin_curves)["curves"]
    checks = {}

    pt = twin["pose_training"]
    if not pt.get("sym_bf16"):
        print(json.dumps({"gate": "sym_bf16_promotion", "error":
                          "twin artifact was not trained with --sym-bf16"}))
        return 2
    tr = pt.get("transitions", {})
    checks["refine_phase_reached"] = bool(pt["refine_phase_reached"])
    checks["transitions_by_margin"] = (
        tr.get("decay", {}).get("trigger") == "margin"
        and tr.get("refine", {}).get("trigger") == "margin")

    gn = max(twin_curves.get("grad_norm_max", [float("inf")]))
    checks["grad_norm_max_le_10"] = gn <= 10.0

    # trainer epochs are 1-indexed and test_dists has one entry per epoch
    # (index i = epoch i+1): a twin trained for E epochs is compared against
    # exactly the exact run's first E per-epoch test distances
    epochs = int(pt["epochs"])
    exact_best_at_e = min(exact_td[:min(epochs, len(exact_td))])
    delta_mm = (pt["best_test_add_m"] - exact_best_at_e) * 1e3
    checks["best_add_within_tol"] = delta_mm <= args.tol_add_mm

    if args.exact_serve and args.twin_serve:
        # n>=36 held-out comparison from attribute_serving artifacts; the
        # product serving condition is the first entry of "conditions"
        ex_art, tw_art = _load(args.exact_serve), _load(args.twin_serve)
        cond = tw_art["conditions"][0]
        serve_n = tw_art["n_frames"]
        serve_rows = {c: (tw_art["per_class"][c][cond],
                          ex_art["per_class"][c][cond])
                      for c in tw_art["per_class"]}
    else:
        cond = "demo_n9"
        serve_n = 9
        serve_rows = {c: (row, exact["serving"]["per_class"][c])
                      for c, row in twin["serving"]["per_class"].items()}

    serve_ok, per_class = True, {}
    for c, (row, ex) in serve_rows.items():
        found_all = row["found"] == row["of"]
        d_mm = (row.get("add_mean_m") or float("inf")) * 1e3 \
            - ex["add_mean_m"] * 1e3
        ok = found_all and d_mm <= args.tol_serve_mm
        per_class[c] = {"found_all": found_all,
                        "add_delta_vs_exact_mm": round(d_mm, 2), "ok": ok}
        serve_ok = serve_ok and ok
    checks["serving_per_class_ok"] = serve_ok

    verdict = {
        "gate": "sym_bf16_promotion",
        "twin_epochs": epochs,
        "twin_best_test_add_m": pt["best_test_add_m"],
        "exact_best_at_same_epoch_m": round(exact_best_at_e, 5),
        "best_add_delta_mm": round(delta_mm, 2),
        "twin_grad_norm_max": round(gn, 2),
        "serving_condition": cond,
        "serving_n_frames": serve_n,
        "per_class": per_class,
        "checks": checks,
        "promote": all(checks.values()),
    }
    print(json.dumps(verdict))
    return 0 if verdict["promote"] else 1


if __name__ == "__main__":
    sys.exit(main())
