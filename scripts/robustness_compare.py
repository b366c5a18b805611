"""Aggregate robustness-grid CSVs into a comparison table.

Reads any mix of this repo's grid CSVs (cli/check_robustness.py output:
Angle,Shift_x,Shift_y,Mean_IoU) and the reference's published grids
(experiments_data/robustness_data/*.csv: Angle,Shift_X,Shift_Y,mIoU —
reference check_robustness.py:101-141) and prints per-file aggregates:
identity mIoU, grid mean/min/max, and the low/high-rotation splits that
show whether a model degrades off-identity.

    python scripts/robustness_compare.py experiments/robustness_tpu512_*.csv \
        /root/reference/experiments_data/robustness_data/robustness_350_class_all_small.csv
"""

import argparse
import os

import pandas as pd


def aggregate(path: str) -> dict:
    df = pd.read_csv(path)
    cols = {c.lower(): c for c in df.columns}
    angle, sx, sy = cols["angle"], cols["shift_x"], cols["shift_y"]
    iou = cols.get("mean_iou") or cols.get("miou")
    ident = df[(df[angle] == 0) & (df[sx] == 0) & (df[sy] == 0)]
    a = df[angle].astype(float).abs()
    return {
        "file": os.path.basename(path),
        "rows": len(df),
        "identity": float(ident[iou].iloc[0]) if len(ident) else float("nan"),
        "mean": df[iou].mean(),
        "min": df[iou].min(),
        "max": df[iou].max(),
        "mean_small_rot": df[iou][a <= 0.2].mean(),
        "mean_large_rot": df[iou][a >= 0.5].mean(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csvs", nargs="+")
    args = ap.parse_args()
    rows = [aggregate(p) for p in args.csvs]
    hdr = ["file", "rows", "identity", "mean", "min", "max",
           "mean_small_rot", "mean_large_rot"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for r in rows:
        print("| " + " | ".join(
            f"{r[k]:.4f}" if isinstance(r[k], float) else str(r[k])
            for k in hdr) + " |")


if __name__ == "__main__":
    main()
