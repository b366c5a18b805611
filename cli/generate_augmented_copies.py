"""Precompute augmented LR masks to hdf5 (reference generate_augmented_copies.py).

Same flags and output layout (data/superres_root/augmented_copies/
<backbone>_<mode>_<classid>_<numaug>[_validation]/<img>.hdf5); the per-image
copies -> forward -> OPM computation is one jitted on-device program instead
of model.predict + an eager host loop.
"""

import argparse

from _common import IMG_SIZE, SEED, build_deeplab, data_paths

parser = argparse.ArgumentParser()
parser.add_argument("--num_aug", help="augmented copies per image (copy 0 is always the identity)",
                    action="store", type=int, default=100)
parser.add_argument("--num_samples", help="cap on how many class-filtered images to process",
                    action="store", type=int, default=500)
parser.add_argument("--mode", help="output-processing mode applied to each LR prediction",
                    action="store", type=str,
                    choices=["slice_max", "slice", "argmax"], default="argmax")
parser.add_argument("--angle_max", help="rotation bound in radians; angles are uniform in +/- this",
                    action="store", type=float, default=0.3)
parser.add_argument("--shift_max", help="translation bound in pixels; shifts are uniform in +/- this",
                    action="store", type=int, default=30)
parser.add_argument("--backbone", help="DeepLabV3+ backbone variant",
                    action="store", type=str,
                    choices=["mobilenet", "xception"], default="xception")
parser.add_argument("--use_validation", help="read the validation split instead of trainaug",
                    action="store_true")
parser.add_argument("--class_id", help="PASCAL class to keep: only images containing it are used",
                    action="store", type=int, default=8, choices=range(21),
                    required=True)
parser.add_argument("--chunk_size", help="model-forward chunk size (0 = single batch)",
                    action="store", type=int, default=0)
parser.add_argument("--shared_tta", action="store_true",
                    help="stage every image with the SAME augmentation set "
                         "(statistically equivalent to per-image draws, and "
                         "downstream solvers then reuse one Gram stencil for "
                         "the whole directory — big sweep speedup)")
parser.add_argument("--weights_path", type=str, default=None)


def main():
    args = parser.parse_args()
    paths = data_paths(args.use_validation, args.backbone, args.mode,
                       args.class_id, args.num_aug)

    from tqdm import tqdm

    from deeplabv3plus_augmented_superresolution_tpu.data import (
        filter_images_by_class,
        get_img_paths,
    )
    from deeplabv3plus_augmented_superresolution_tpu.pipeline import (
        compute_augmented_feature_maps,
    )

    image_paths = get_img_paths(paths["image_list"], paths["imgs_path"],
                                is_png=False, sort=True)
    filtered = filter_images_by_class(image_paths, filter_class_id=args.class_id,
                                      num_images=args.num_samples,
                                      image_size=IMG_SIZE)
    print(f"Valid images: {len(filtered)} (Initial: {len(image_paths)})")

    cfg, params, _ = build_deeplab(args.backbone, final_upsample=False,
                                   weights_path=args.weights_path)

    print("Generating augmented copies...")
    for image_path in tqdm(filtered):
        compute_augmented_feature_maps(
            params, cfg, image_path, filter_class_id=args.class_id,
            mode=args.mode, num_aug=args.num_aug, angle_max=args.angle_max,
            shift_max=args.shift_max, image_size=IMG_SIZE,
            chunk_size=args.chunk_size,
            dest_folder=paths["augmented_copies_dir"], seed=SEED,
            shared_tta=args.shared_tta)


if __name__ == "__main__":
    main()
