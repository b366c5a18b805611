"""End-to-end smoke test on the bundled cat image (reference test_SR.py).

Runs the FULL fused pipeline in one jitted program: augmented copies ->
DeepLabV3+ forward -> OPM -> aug/max/mean SR -> threshold, then IoUs vs the
ground truth. The reference stages this through three eager phases
(test_SR.py:57-100); here it is one XLA program per SR type.
"""

import argparse
import os
import time

import numpy as np

from _common import FEATURE_SIZE, IMG_SIZE, SEED, add_sr_args, build_deeplab, make_sr_config

parser = argparse.ArgumentParser()
_FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         os.pardir, "test_images")
parser.add_argument("--img_path", type=str,
                    default=os.path.join(_FIXTURES, "smoke_input.jpg"))
parser.add_argument("--gt_path", type=str,
                    default=os.path.join(_FIXTURES, "smoke_gt.png"))
parser.add_argument("--output_dir", type=str,
                    default=os.path.join(os.getcwd(), "test_images", "SR_output"))
parser.add_argument("--class_id", type=int, default=8)
parser.add_argument("--mode", type=str, default="argmax",
                    choices=["slice_max", "slice", "argmax"])
parser.add_argument("--backbone", type=str, default="xception",
                    choices=["mobilenet", "xception"])
parser.add_argument("--num_aug", type=int, default=100)
parser.add_argument("--angle_max", type=float, default=0.15)
parser.add_argument("--shift_max", type=float, default=80)
parser.add_argument("--th_factor", type=float, default=0.2)
parser.add_argument("--save_images", action="store_true")
parser.add_argument("--plot", action="store_true",
                    help="save the input/GT/prediction+overlay panel")
parser.add_argument("--weights_path", type=str, default=None)
add_sr_args(parser)


def main():
    args = parser.parse_args()

    import jax
    from deeplabv3plus_augmented_superresolution_tpu.data import load_image, save_img
    from deeplabv3plus_augmented_superresolution_tpu.metrics import compute_iou
    from deeplabv3plus_augmented_superresolution_tpu.pipeline import (
        asr_step,
        sample_augmentations,
    )

    model_cfg, params, _ = build_deeplab(args.backbone, final_upsample=False,
                                         weights_path=args.weights_path)
    # LR mask resolution: 512/OS16*4 = 128 for xception's decoder output,
    # 512/OS8 = 64 for mobilenet (no decoder)
    feature = (64, 64) if args.backbone == "mobilenet" else FEATURE_SIZE
    sr_cfg = make_sr_config(args, num_aug=args.num_aug, feature_size=feature,
                            angle_max=args.angle_max)

    image = load_image(args.img_path, image_size=IMG_SIZE, normalize=True)
    gt_mask = load_image(args.gt_path, image_size=IMG_SIZE, normalize=False,
                         is_png=True, resize_method="nearest")

    angles, shifts = sample_augmentations(jax.random.key(SEED), args.num_aug,
                                          args.angle_max, args.shift_max)

    t0 = time.time()
    out = asr_step(params, image, angles, shifts, model_cfg, sr_cfg,
                   class_id=args.class_id, mode=args.mode,
                   th_factor=args.th_factor)
    out = {k: np.asarray(v) for k, v in out.items()}
    compile_run = time.time() - t0

    t0 = time.time()
    out = asr_step(params, image, angles, shifts, model_cfg, sr_cfg,
                   class_id=args.class_id, mode=args.mode,
                   th_factor=args.th_factor)
    out = {k: np.asarray(v) for k, v in out.items()}
    steady = time.time() - t0

    ious = {k: compute_iou(gt_mask, v, img_size=IMG_SIZE, class_id=args.class_id)
            for k, v in out.items()}
    print(f"Aug. SR ({args.mode} OPM) IoU: {ious['aug']}, "
          f"Max SR IoU: {ious['max']}, Mean SR IoU: {ious['mean']}, "
          f"Standard IoU: {ious['standard']}")
    print(f"timing: compile+run {compile_run:.1f}s, steady {steady:.3f}s/image "
          f"({args.num_aug} copies, {sr_cfg.num_iter} iters, aug+max+mean)")

    if args.save_images:
        name = os.path.splitext(os.path.basename(args.img_path))[0]
        for sr_type in ("aug", "max", "mean"):
            save_img(os.path.join(args.output_dir, f"{sr_type}_SR",
                                  f"{name}_{sr_type}_SR.png"),
                     out[sr_type], scale=True)
        print(f"saved outputs under {args.output_dir}")

    if args.plot:
        from deeplabv3plus_augmented_superresolution_tpu.utils import plot_prediction
        input_image = load_image(args.img_path, image_size=IMG_SIZE,
                                 normalize=False, resize_method="nearest")
        panel = os.path.join(args.output_dir, "prediction_panel.png")
        os.makedirs(args.output_dir, exist_ok=True)
        plot_prediction([input_image, gt_mask, out["aug"]],
                        only_prediction=False, show_overlay=True,
                        save_path=panel)
        print(f"saved {panel}")


if __name__ == "__main__":
    main()
