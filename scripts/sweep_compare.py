"""Structural comparison of reproduced hyperparameter sweeps vs the
reference's published sweep findings (VERDICT r4 next #1).

The reference's published λ-space conclusions (its defaults rest on them):
  1. λ_L1 = 0 is best — L1 hurts (best run `neat-sweep-42` has lambda_L1=0,
     reference experiments_data/sweep_data/argmax_no_norm_l1.csv),
  2. the λ_tv/λ_L2 optimum sits in a low basin (published best
     λ_tv=0.35, λ_L2=0.615),
  3. copy-dropout is tolerated (several top sweep_all runs carry 0.1-0.2),
  4. adam-family optimizers beat sgd-style steps,
  5. BTV does not win over plain TV.

This script computes the SAME statistics from (a) our reproduced sweep CSVs
(cli/sweep_agent.py output) and (b) the reference's committed sweep CSVs,
and emits a side-by-side JSON verdict per finding: reproduced / not.

Usage:
    python scripts/sweep_compare.py \
        --ours_lambda experiments/sweep_hard_lambda.csv \
        --ours_all experiments/sweep_hard_all.csv \
        --out experiments/sweep_structural_comparison.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DIR = "/root/reference/experiments_data/sweep_data"


def load_csv(path):
    import pandas as pd

    df = pd.read_csv(path)
    df.columns = [c.strip('"') for c in df.columns]
    # Normalize the metric/param names across our schema and the reference's
    # wandb exports.
    ren = {"avg_aug_SR_iou": "aug_iou", "aug_iou_single": "aug_iou",
           "avg_standard_iou": "standard_iou",
           "standard_iou_single": "standard_iou"}
    df = df.rename(columns=ren)
    for c in ("lambda_tv", "lambda_L2", "lambda_L1", "copy_dropout",
              "num_iter", "learning_rate", "aug_iou", "standard_iou"):
        if c in df:
            df[c] = pd.to_numeric(df[c], errors="coerce")
    if "use_BTV" in df:
        df["use_BTV"] = df["use_BTV"].astype(str).str.lower().isin(
            ("true", "1"))
    return df


def lambda_findings(df, label):
    """Findings 1-2 from a λ-space sweep table."""
    import numpy as np

    df = df.dropna(subset=["aug_iou"])
    out = {"label": label, "n_trials": int(len(df)), "best": {}}
    if not len(df):
        return out
    best = df.loc[df["aug_iou"].idxmax()]
    for c in ("lambda_tv", "lambda_L2", "lambda_L1", "aug_iou",
              "standard_iou"):
        if c in df and np.isfinite(best.get(c, np.nan)):
            out["best"][c] = round(float(best[c]), 4)
    top = df.nlargest(max(len(df) // 4, 3), "aug_iou")
    bottom = df.nsmallest(max(len(df) // 4, 3), "aug_iou")
    if "lambda_L1" in df and df["lambda_L1"].notna().any():
        out["l1_top_quartile_mean"] = round(float(top["lambda_L1"].mean()), 3)
        out["l1_bottom_quartile_mean"] = round(
            float(bottom["lambda_L1"].mean()), 3)
        out["corr_aug_iou_vs_l1"] = round(
            float(df["aug_iou"].corr(df["lambda_L1"])), 3)
        out["finding_l1_hurts"] = bool(
            out["l1_top_quartile_mean"] < out["l1_bottom_quartile_mean"])
    for c in ("lambda_tv", "lambda_L2"):
        if c in df and df[c].notna().any():
            out[f"{c}_top_quartile_mean"] = round(float(top[c].mean()), 3)
            out[f"{c}_top_quartile_range"] = [round(float(top[c].min()), 3),
                                              round(float(top[c].max()), 3)]
    return out


def noop_anchor(df):
    """Detect the no-op-solve anchor: with a weak optimizer/lr draw the
    solver leaves the initialization untouched, so those trials score a
    BIT-IDENTICAL aug_iou (the init's own IoU). Three or more exact
    repeats of one float can't come from distinct 400-iteration solves."""
    counts = df["aug_iou"].value_counts()
    if not len(counts) or counts.iloc[0] < 3:
        return None, df
    v = float(counts.index[0])
    mask = df["aug_iou"] == counts.index[0]
    return ({"aug_iou": round(v, 4), "n_trials": int(mask.sum()),
             "interpretation": ("bit-identical metric across these trials "
                                "=> the solve was a no-op; this value is "
                                "the initialization's IoU, not an "
                                "optimizer win")},
            df[~mask])


def wide_findings(df, label):
    """Findings 3-5 from a sweep_all-style table."""
    import numpy as np

    df = df.dropna(subset=["aug_iou"])
    out = {"label": label, "n_trials": int(len(df))}
    if not len(df):
        return out
    anchor, df_real = noop_anchor(df)
    if anchor is not None:
        out["noop_anchor"] = anchor
        delta = (round(float(df_real["aug_iou"].max() - anchor["aug_iou"]),
                       4) if len(df_real) else None)
        out["best_real_solve_vs_noop"] = delta
        if delta is not None and delta <= 0:
            out["degenerate_space"] = (
                "no real solve in this search space beats the no-op "
                "initialization, so per-knob findings here rank 'which "
                "configs disturb the init least', not solver quality; the "
                "regime's true lambda structure is in the lambda-space "
                "sweep, whose solves DO beat the init")
    best = df.loc[df["aug_iou"].idxmax()]
    out["best"] = {c: (round(float(best[c]), 4)
                       if isinstance(best[c], (int, float, np.floating))
                       else str(best[c]))
                   for c in ("lambda_tv", "lambda_L2", "lambda_L1",
                             "copy_dropout", "optimizer", "use_BTV",
                             "num_iter", "learning_rate", "aug_iou")
                   if c in df}
    if "copy_dropout" in df and df["copy_dropout"].notna().any():
        by = df.groupby("copy_dropout")["aug_iou"].agg(["mean", "max",
                                                        "count"])
        out["by_copy_dropout"] = {
            str(round(float(k), 2)): {"mean": round(float(v["mean"]), 4),
                                      "max": round(float(v["max"]), 4),
                                      "n": int(v["count"])}
            for k, v in by.iterrows()}
        zero = df[df["copy_dropout"] == 0]["aug_iou"].max()
        some = df[(df["copy_dropout"] > 0)
                  & (df["copy_dropout"] <= 0.2)]["aug_iou"].max()
        if np.isfinite(zero) and np.isfinite(some):
            out["finding_dropout_tolerated"] = bool(some >= zero - 0.005)
    if "optimizer" in df:
        by = df.groupby("optimizer")["aug_iou"].agg(["mean", "max", "count"])
        out["by_optimizer"] = {
            str(k): {"mean": round(float(v["mean"]), 4),
                     "max": round(float(v["max"]), 4), "n": int(v["count"])}
            for k, v in by.iterrows()}
        adamish = df[df["optimizer"].isin(["adam", "adamax", "adagrad",
                                           "adadelta"])]["aug_iou"].max()
        sgd = df[df["optimizer"] == "sgd"]["aug_iou"].max()
        if np.isfinite(adamish) and (np.isfinite(sgd) or "sgd" not in set(
                df["optimizer"])):
            out["finding_adam_family_best"] = bool(
                not np.isfinite(sgd) or adamish > sgd)
        if anchor is not None and len(df_real):
            # No-op trials score the init's IoU regardless of optimizer, so
            # the real optimizer ordering must exclude them.
            by = df_real.groupby("optimizer")["aug_iou"].agg(
                ["mean", "max", "count"])
            out["by_optimizer_excl_noop"] = {
                str(k): {"mean": round(float(v["mean"]), 4),
                         "max": round(float(v["max"]), 4),
                         "n": int(v["count"])}
                for k, v in by.iterrows()}
            a = df_real[df_real["optimizer"].isin(
                ["adam", "adamax", "adagrad", "adadelta"])]["aug_iou"].max()
            s = df_real[df_real["optimizer"] == "sgd"]["aug_iou"].max()
            if np.isfinite(a):
                out["finding_adam_family_best_excl_noop"] = bool(
                    not np.isfinite(s) or a > s)
    if "use_BTV" in df:
        by = df.groupby("use_BTV")["aug_iou"].agg(["mean", "max", "count"])
        out["by_use_BTV"] = {
            str(bool(k)): {"mean": round(float(v["mean"]), 4),
                           "max": round(float(v["max"]), 4),
                           "n": int(v["count"])}
            for k, v in by.iterrows()}
        t = df[df["use_BTV"]]["aug_iou"].max()
        f = df[~df["use_BTV"]]["aug_iou"].max()
        if np.isfinite(t) and np.isfinite(f):
            out["finding_btv_no_win"] = bool(f >= t - 0.002)
    if "num_iter" in df and df["num_iter"].notna().any():
        by = df.groupby("num_iter")["aug_iou"].agg(["mean", "max", "count"])
        out["by_num_iter"] = {
            str(int(k)): {"mean": round(float(v["mean"]), 4),
                          "max": round(float(v["max"]), 4),
                          "n": int(v["count"])}
            for k, v in by.iterrows()}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours_lambda", required=True,
                    help="sweep_agent CSV for the lambda-only space "
                         "(configs/sweep_configs/sweep.yaml)")
    ap.add_argument("--ours_all", required=True,
                    help="sweep_agent CSV for the wide space "
                         "(configs/sweep_configs/sweep_all.yaml)")
    ap.add_argument("--ours_lambda_std", default=None,
                    help="optional second sweep.yaml-space CSV measured in "
                         "the SATURATED regime (easy scenes, standard IoU "
                         "near the reference's ~0.87 operating point) — "
                         "tests whether the lambda basin location is "
                         "calibration-dependent")
    ap.add_argument("--ref_dir", default=REF_DIR)
    ap.add_argument("--out", default="sweep_structural_comparison.json")
    args = ap.parse_args()

    ours_lambda = lambda_findings(load_csv(args.ours_lambda),
                                  "ours: hard regime, sweep.yaml space")
    ours_all_df = load_csv(args.ours_all)
    ours_all = wide_findings(ours_all_df,
                             "ours: hard regime, sweep_all.yaml space")
    ours_all_lambda = lambda_findings(ours_all_df,
                                      "ours: sweep_all λ marginals")

    ref = {}
    ref_l1 = os.path.join(args.ref_dir, "argmax_no_norm_l1.csv")
    if os.path.exists(ref_l1):
        ref["lambda"] = lambda_findings(
            load_csv(ref_l1), "reference: argmax_no_norm_l1.csv (class 8, "
            "500 imgs, VOC + bonlime)")
    ref_all = os.path.join(args.ref_dir, "argmax_500_sweep_all.csv")
    if os.path.exists(ref_all):
        df = load_csv(ref_all)
        ref["all"] = wide_findings(df, "reference: argmax_500_sweep_all.csv")
        ref["all_lambda"] = lambda_findings(df,
                                            "reference: sweep_all λ marginals")

    ours_lambda_std = None
    if args.ours_lambda_std and os.path.exists(args.ours_lambda_std):
        ours_lambda_std = lambda_findings(
            load_csv(args.ours_lambda_std),
            "ours: saturated regime, sweep.yaml space")

    verdicts = {}
    if ours_lambda_std is not None and "lambda_tv_top_quartile_mean" in (
            ours_lambda_std) and "lambda_tv_top_quartile_mean" in ours_lambda:
        # Reconciliation test: the reference's near-zero basin was measured
        # at a saturated operating point (standard IoU 0.8290 with the
        # bonlime checkpoint). If our basin also collapses toward zero when
        # WE move to a saturated operating point, the published finding is
        # regime-dependent rather than contradicted.
        hard_tv = ours_lambda["lambda_tv_top_quartile_mean"]
        std_tv = ours_lambda_std["lambda_tv_top_quartile_mean"]
        hard_l2 = ours_lambda.get("lambda_L2_top_quartile_mean")
        std_l2 = ours_lambda_std.get("lambda_L2_top_quartile_mean")
        verdicts["basin_is_calibration_dependent"] = {
            "published": ("best lambda_tv=0.35, lambda_L2=0.615 at a "
                          "saturated operating point (standard 0.8290)"),
            "hard_regime_top_quartile": {"lambda_tv": hard_tv,
                                         "lambda_L2": hard_l2},
            "saturated_regime_top_quartile": {"lambda_tv": std_tv,
                                              "lambda_L2": std_l2},
            # A real reconciliation needs the basin to COLLAPSE into the
            # published low-lambda half of the grid, not wiggle by a tick.
            "basin_collapses_at_saturation": bool(std_tv < 2.0),
            "interpretation": (
                "collapses => the published near-zero basin is a "
                "calibration artifact; persists => it reflects the data "
                "domain (real VOC fine structure penalizes heavy "
                "smoothing; piecewise-constant synthetic masks do not)"),
        }
    if "finding_l1_hurts" in ours_lambda:
        verdicts["l1_zero_best"] = {
            "published": "best run lambda_L1=0; L1 correlates negatively",
            "ours": ours_lambda,
            "reproduced": ours_lambda.get("finding_l1_hurts"),
        }
    for key, src in (("dropout_tolerated", "finding_dropout_tolerated"),
                     ("adam_family_best", "finding_adam_family_best"),
                     ("btv_no_win", "finding_btv_no_win")):
        if src in ours_all:
            verdicts[key] = {"ours": ours_all.get(src),
                             "reference": ref.get("all", {}).get(src),
                             "reproduced": ours_all.get(src)}
    if "finding_adam_family_best_excl_noop" in ours_all:
        # The inclusive check scores no-op trials (weak optimizer => init's
        # IoU), so the honest optimizer ordering excludes them.
        v = ours_all["finding_adam_family_best_excl_noop"]
        verdicts["adam_family_best"]["ours_excl_noop_solves"] = v
        verdicts["adam_family_best"]["reproduced"] = v
    if "degenerate_space" in ours_all:
        for key in ("dropout_tolerated", "adam_family_best", "btv_no_win"):
            if key in verdicts:
                verdicts[key]["caveat_degenerate_space"] = (
                    ours_all["degenerate_space"])

    result = {
        "ours": {"lambda_space": ours_lambda, "wide_space": ours_all,
                 "wide_space_lambda_marginals": ours_all_lambda,
                 **({"lambda_space_saturated": ours_lambda_std}
                    if ours_lambda_std is not None else {})},
        "reference_published": ref,
        "published_best_anchor": {
            "lambda_tv": 0.35, "lambda_L2": 0.615, "lambda_L1": 0.0,
            "aug_iou_single": 0.8385, "standard_iou_single": 0.8290,
            "source": "argmax_no_norm_l1.csv row neat-sweep-42"},
        "verdicts": verdicts,
    }

    def sanitize(x):
        if isinstance(x, float) and not (x == x and abs(x) != float("inf")):
            return None
        if isinstance(x, dict):
            return {k: sanitize(v) for k, v in x.items()}
        if isinstance(x, list):
            return [sanitize(v) for v in x]
        return x

    with open(args.out, "w") as f:
        json.dump(sanitize(result), f, indent=2, allow_nan=False)
    print(json.dumps(sanitize(verdicts), indent=2))
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
