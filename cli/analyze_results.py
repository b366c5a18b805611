"""Analysis of experiment CSVs (counterpart of the reference's plot_cvs.ipynb):
robustness heat/line plots, threshold curves, sweep scatter, per-class bars.

Reads whatever CSVs exist under experiments_data/ and writes PNGs next to
them plus a text summary to stdout.
"""

import argparse
import glob
import os

import _common  # noqa: F401

parser = argparse.ArgumentParser()
parser.add_argument("--experiments_dir", type=str,
                    default=os.path.join(os.getcwd(), "experiments_data"))
parser.add_argument("--no_plots", action="store_true",
                    help="text summaries only")


def main():
    args = parser.parse_args()
    import pandas as pd

    if not args.no_plots:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

    found = False

    for path in sorted(glob.glob(os.path.join(args.experiments_dir, "th_*.csv"))):
        found = True
        df = pd.read_csv(path)
        best = df.iloc[df["avg_iou"].idxmax()]
        print(f"[threshold] {os.path.basename(path)}: best th_factor="
              f"{best.th_factor} IoU={best.avg_iou:.4f}")
        if not args.no_plots:
            ax = df.plot(x="th_factor", y="avg_iou", marker="o", legend=False)
            ax.set_ylabel("avg IoU")
            ax.figure.savefig(path.replace(".csv", ".png"), dpi=120,
                              bbox_inches="tight")

    for path in sorted(glob.glob(os.path.join(args.experiments_dir,
                                              "robustness_*.csv"))):
        found = True
        df = pd.read_csv(path)
        ident = df[(df.Angle == 0) & (df.Shift_x == 0) & (df.Shift_y == 0)]
        print(f"[robustness] {os.path.basename(path)}: identity mIoU="
              f"{float(ident.Mean_IoU.iloc[0]) if len(ident) else float('nan'):.4f} "
              f"range=[{df.Mean_IoU.min():.4f}, {df.Mean_IoU.max():.4f}]")
        if not args.no_plots:
            zero_shift = df[(df.Shift_x == 0) & (df.Shift_y == 0)]
            fig, axes = plt.subplots(1, 2, figsize=(11, 4))
            zero_shift.plot(x="Angle", y="Mean_IoU", ax=axes[0], legend=False,
                            title="mIoU vs rotation (no shift)")
            zero_angle = df[df.Angle == 0]
            if len(zero_angle):
                pivot = zero_angle.pivot_table(index="Shift_y",
                                               columns="Shift_x",
                                               values="Mean_IoU")
                im = axes[1].imshow(pivot.values, origin="lower",
                                    extent=[pivot.columns.min(), pivot.columns.max(),
                                            pivot.index.min(), pivot.index.max()])
                axes[1].set_title("mIoU vs shift (no rotation)")
                fig.colorbar(im, ax=axes[1])
            fig.savefig(path.replace(".csv", ".png"), dpi=120,
                        bbox_inches="tight")

    for path in sorted(glob.glob(os.path.join(args.experiments_dir,
                                              "sweep_*.csv"))):
        found = True
        df = pd.read_csv(path)
        if "aug_iou_single" in df:
            best = df.iloc[df["aug_iou_single"].idxmax()]
            print(f"[sweep] {os.path.basename(path)}: {len(df)} runs, best "
                  f"aug_iou_single={best.aug_iou_single:.4f} "
                  f"(lambda_tv={best.get('lambda_tv')}, "
                  f"lambda_L2={best.get('lambda_L2')}, "
                  f"lambda_L1={best.get('lambda_L1')})")
            if not args.no_plots and {"lambda_tv", "lambda_L2"} <= set(df):
                ax = df.plot.scatter(x="lambda_tv", y="lambda_L2",
                                     c="aug_iou_single", colormap="viridis")
                ax.figure.savefig(path.replace(".csv", "_lambda_space.png"),
                                  dpi=120, bbox_inches="tight")

    if not found:
        print(f"No experiment CSVs found under {args.experiments_dir}; run "
              "threshold_tests.py / check_robustness.py / sweep_script.py first.")


if __name__ == "__main__":
    main()
