"""Threshold-factor sweep (reference threshold_tests.py): one aug-SR solve per
image, evaluated at a grid of th_factor values; per-factor average IoUs to
th_<mode>_<num_samples>.csv.
"""

import argparse
import os

from _common import IMG_SIZE, SEED, add_sr_args, data_paths, make_sr_config

parser = argparse.ArgumentParser()
parser.add_argument("--num_aug", type=int, default=100)
parser.add_argument("--num_samples", type=int, default=500)
parser.add_argument("--class_id", type=int, default=8, choices=range(21))
parser.add_argument("--mode", type=str, default="argmax",
                    choices=["slice_max", "slice", "argmax"])
parser.add_argument("--backbone", type=str, default="xception",
                    choices=["mobilenet", "xception"])
parser.add_argument("--use_validation", action="store_true", default=True)
parser.add_argument("--no_validation", dest="use_validation", action="store_false")
parser.add_argument("--th_start", type=float, default=0.1)
parser.add_argument("--th_stop", type=float, default=0.9)
parser.add_argument("--th_step", type=float, default=0.05)
parser.add_argument("--angle_max", type=float, default=0.5)
parser.add_argument("--output_csv", type=str, default=None)
add_sr_args(parser)


def main():
    args = parser.parse_args()
    paths = data_paths(args.use_validation, args.backbone, args.mode,
                       args.class_id, args.num_aug)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd
    from tqdm import tqdm

    from deeplabv3plus_augmented_superresolution_tpu.data import (
        list_precomputed_data_paths,
        load_image,
        load_sr_data,
    )
    from deeplabv3plus_augmented_superresolution_tpu.metrics import compute_iou
    from deeplabv3plus_augmented_superresolution_tpu.sr import (
        augmented_superresolution,
        threshold_image,
    )

    path_list = list_precomputed_data_paths(paths["augmented_copies_dir"], sort=True)
    path_list = path_list[:args.num_samples] if args.num_samples else path_list
    if not path_list:
        raise SystemExit(
            f"No precomputed hdf5 files under {paths['augmented_copies_dir']}")

    th_factors = np.arange(args.th_start, args.th_stop + 1e-9, args.th_step)
    rows = {round(float(t), 4): [] for t in th_factors}

    for filepath in tqdm(path_list):
        try:
            class_masks, max_masks, angles, shifts, filename = load_sr_data(
                filepath, num_aug=args.num_aug, global_normalize=True)
        except Exception:
            print(f"File: {filepath} is invalid, skipping...")
            continue

        true_mask = load_image(
            os.path.join(paths["pascal_root"], "SegmentationClassAug",
                         f"{filename}.png"),
            image_size=IMG_SIZE, normalize=False, is_png=True,
            resize_method="nearest")

        sr_cfg = make_sr_config(args, num_aug=args.num_aug,
                                feature_size=tuple(class_masks.shape[1:3]))
        target, _ = augmented_superresolution(
            jnp.asarray(class_masks), jnp.asarray(angles), jnp.asarray(shifts),
            sr_cfg, dropout_key=jax.random.key(SEED))

        # one solve, many thresholds (reference threshold_tests.py:104,136-142)
        for t in rows:
            mask = threshold_image(target, args.class_id, th_factor=t)
            rows[t].append(compute_iou(true_mask, np.asarray(mask),
                                       img_size=IMG_SIZE, class_id=args.class_id))

    df = pd.DataFrame({
        "th_factor": list(rows),
        "avg_iou": [float(np.mean(v)) for v in rows.values()],
        "num_images": [len(v) for v in rows.values()],
    })
    out_csv = args.output_csv or os.path.join(
        os.getcwd(), "experiments_data", f"th_{args.mode}_{args.num_samples}.csv")
    os.makedirs(os.path.dirname(out_csv), exist_ok=True)
    df.to_csv(out_csv, index=False)
    best = df.iloc[df["avg_iou"].idxmax()]
    print(df.to_string(index=False))
    print(f"Best threshold: {best.th_factor} (IoU {best.avg_iou:.4f}); wrote {out_csv}")


if __name__ == "__main__":
    main()
