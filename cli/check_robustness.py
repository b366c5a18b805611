"""Model-robustness grid study (reference check_robustness.py): augment a
fixed image set over an (angle, shift_x, shift_y) grid, run the full model,
record mean IoU per combo to CSV.

TPU-native: the (augment -> forward -> argmax -> per-image IoU -> mean) for
one combo is a single jitted program over the whole image batch instead of
model.predict(batch_size=16) + a host loop (reference check_robustness.py:107-133).
"""

import argparse
import csv
import os
import random

from _common import IMG_SIZE, SEED, build_deeplab, data_paths

parser = argparse.ArgumentParser()
parser.add_argument("--num_samples", type=int, default=350)
parser.add_argument("--class_id", type=int, default=None,
                    help="optional class filter; default random sample over all classes")
parser.add_argument("--backbone", type=str, default="xception",
                    choices=["mobilenet", "xception"])
parser.add_argument("--use_validation", action="store_true")
parser.add_argument("--angle_range", type=float, default=0.7)
parser.add_argument("--angle_step", type=float, default=0.05)
parser.add_argument("--shift_max", type=float, default=80)
parser.add_argument("--shift_steps", type=int, default=9)
parser.add_argument("--batch_size", type=int, default=16)
parser.add_argument("--output_csv", type=str, default=None)
parser.add_argument("--weights_path", type=str, default=None)


def main():
    args = parser.parse_args()
    paths = data_paths(args.use_validation, args.backbone)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from tqdm import tqdm

    from deeplabv3plus_augmented_superresolution_tpu.data import (
        filter_images_by_class,
        get_img_paths,
        load_image,
    )
    from deeplabv3plus_augmented_superresolution_tpu.metrics import mean_iou
    from deeplabv3plus_augmented_superresolution_tpu.ops.shear_warp import (
        paeth_rotate_translate,
    )

    rng = random.Random(SEED)
    image_paths = get_img_paths(paths["image_list"], paths["imgs_path"], sort=True)
    if args.class_id is not None:
        image_paths = filter_images_by_class(image_paths, args.class_id,
                                             num_images=args.num_samples,
                                             image_size=IMG_SIZE)
    else:
        image_paths = rng.sample(image_paths, min(args.num_samples, len(image_paths)))

    print(f"Loading {len(image_paths)} images + GT masks...")
    images, gts = [], []
    for p in image_paths:
        images.append(load_image(p, image_size=IMG_SIZE, normalize=True))
        gt_path = p.replace("JPEGImages", "SegmentationClassAug").replace("jpg", "png")
        gts.append(load_image(gt_path, image_size=IMG_SIZE, normalize=False,
                              is_png=True, resize_method="nearest"))
    images = jnp.asarray(np.stack(images))
    gts = jnp.asarray(np.stack(gts))

    cfg, params, apply_fn = build_deeplab(args.backbone, final_upsample=True,
                                          weights_path=args.weights_path)

    angle_bound = max(args.angle_range + 0.05, 1e-3)

    from functools import partial

    @partial(jax.jit, static_argnames=())
    def combo_iou_sums(p, imgs, gt, angle, sx, sy):
        n = imgs.shape[0]
        angles = jnp.full((n,), angle, jnp.float32)
        shifts = jnp.broadcast_to(jnp.asarray([sx, sy], jnp.float32), (n, 2))
        aug = paeth_rotate_translate(imgs, angles, shifts, angle_bound)
        # GT is warped with nearest interpolation (pure label selection — no
        # blending of class ids or of the 255 ignore label into neighbors),
        # matching reference check_robustness.py:47-50.
        gt_aug = paeth_rotate_translate(gt.astype(jnp.float32), angles, shifts,
                                        angle_bound, interpolation="nearest")
        logits = apply_fn(p, aug)
        pred = jnp.argmax(logits, axis=-1)

        def one(gt_i, pred_i):
            return mean_iou(gt_i, pred_i)

        ious = jax.vmap(one)(gt_aug[..., 0], pred)
        valid = ~jnp.isnan(ious)
        # (sum, count) so the caller can weight the combo mean PER IMAGE
        # across ragged batches, matching the reference's all-image
        # accounting (check_robustness.py:113-126).
        return jnp.sum(jnp.where(valid, ious, 0.0)), jnp.sum(valid)

    angles = np.arange(-args.angle_range, args.angle_range + 1e-6, args.angle_step)
    shift_vals = np.linspace(-args.shift_max, args.shift_max, args.shift_steps)

    out_csv = args.output_csv or os.path.join(
        os.getcwd(), "experiments_data",
        f"robustness_{args.num_samples}_class_{args.class_id if args.class_id is not None else 'all'}.csv")
    os.makedirs(os.path.dirname(out_csv), exist_ok=True)

    # Ceil division: the ragged tail batch contributes too (the reference
    # scores every sampled image). At most one extra compiled shape.
    n_batches = -(-len(image_paths) // args.batch_size)
    with open(out_csv, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["Angle", "Shift_x", "Shift_y", "Mean_IoU"])
        for angle in tqdm(angles):
            for sx in shift_vals:
                for sy in shift_vals:
                    # batch over images to bound memory; per-image weighting
                    tot, cnt = 0.0, 0.0
                    for b in range(n_batches):
                        sl = slice(b * args.batch_size, (b + 1) * args.batch_size)
                        s, c = combo_iou_sums(params, images[sl], gts[sl],
                                              float(angle), float(sx), float(sy))
                        tot += float(s)
                        cnt += float(c)
                    miou = tot / cnt if cnt else float("nan")
                    writer.writerow([round(float(angle), 4), float(sx), float(sy),
                                     miou])
                    f.flush()
    print(f"Wrote {out_csv}")


if __name__ == "__main__":
    main()
