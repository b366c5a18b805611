"""Standard (plain bilinear-upsample) baseline masks (reference
generate_standard_output.py): full model with final x4 upsample, argmax,
zero non-class pixels, PNG per image under
data/superres_root/standard_output/<backbone>_<classid>[_validation]/.
"""

import argparse
import os

from _common import IMG_SIZE, build_deeplab, data_paths

parser = argparse.ArgumentParser()
parser.add_argument("--num_samples", action="store", type=int, default=500)
parser.add_argument("--backbone", action="store", type=str,
                    choices=["mobilenet", "xception"], default="xception")
parser.add_argument("--use_validation", action="store_true")
parser.add_argument("--class_id", action="store", type=int, default=8,
                    choices=range(21), required=True)
parser.add_argument("--weights_path", type=str, default=None)


def main():
    args = parser.parse_args()
    paths = data_paths(args.use_validation, args.backbone,
                       class_id=args.class_id)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from tqdm import tqdm

    from deeplabv3plus_augmented_superresolution_tpu.data import (
        filter_images_by_class,
        get_img_paths,
        load_image,
        save_img,
    )

    image_paths = get_img_paths(paths["image_list"], paths["imgs_path"],
                                is_png=False, sort=True)
    if args.class_id is not None:
        image_paths = filter_images_by_class(image_paths,
                                             filter_class_id=args.class_id,
                                             image_size=IMG_SIZE)
    image_paths = image_paths[:args.num_samples]
    print(f"Valid images: {len(image_paths)}")

    cfg, params, apply_fn = build_deeplab(args.backbone, final_upsample=True,
                                          weights_path=args.weights_path)

    @jax.jit
    def standard_mask(p, image):
        logits = apply_fn(p, image[None])[0]
        mask = jnp.argmax(logits, axis=-1)[..., None]
        return jnp.where(mask == args.class_id, mask, 0)

    dest = paths["standard_output_dir"]
    os.makedirs(dest, exist_ok=True)
    print("Computing standard output images...")
    for image_path in tqdm(image_paths):
        name = os.path.splitext(os.path.basename(image_path))[0]
        image = load_image(image_path, image_size=IMG_SIZE, normalize=True)
        mask = np.asarray(standard_mask(params, jnp.asarray(image)))
        save_img(os.path.join(dest, f"{name}.png"), mask, scale=False)


if __name__ == "__main__":
    main()
