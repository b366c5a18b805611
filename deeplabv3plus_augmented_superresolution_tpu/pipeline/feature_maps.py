"""Fused copies -> model forward -> OPM extraction.

Replaces the reference's eager staging loop (augmentation_utils.py:62-138:
model.predict(batch_size=16) + per-copy host OPM loop + gc.collect) with a
single jitted program: the augmented batch never leaves the device between
warping, the DeepLabV3+ forward, and mask extraction. hdf5 export stays
available for reference-compatible staging.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.deeplab import DeepLabConfig, forward
from ..ops.opm import extract_masks
from .augment import make_augmented_copies, sample_augmentations


@partial(jax.jit, static_argnames=("cfg", "class_id", "mode", "num_aug",
                                   "chunk_size", "warp_impl", "angle_max"))
def augmented_feature_maps(params, image: jnp.ndarray, angles: jnp.ndarray,
                           shifts: jnp.ndarray, cfg: DeepLabConfig,
                           class_id: int, mode: str = "argmax",
                           num_aug: int = 100, chunk_size: int = 0,
                           warp_impl: str = "shear", angle_max: float = 0.35):
    """(H, W, 3) image -> (class_masks (N, h, w, 1), max_masks | zeros).

    chunk_size > 0 bounds activation memory by scanning the model forward over
    copy chunks (the TPU analogue of the reference's batch_size=16 predict);
    0 runs all copies in one batch.
    """
    copies = make_augmented_copies(image, angles, shifts, num_aug,
                                   warp_impl=warp_impl, angle_max=angle_max)

    if chunk_size and num_aug > chunk_size and num_aug % chunk_size == 0:
        chunks = copies.reshape((num_aug // chunk_size, chunk_size) + copies.shape[1:])
        preds = jax.lax.map(lambda c: forward(params, c, cfg), chunks)
        preds = preds.reshape((num_aug,) + preds.shape[2:])
    else:
        preds = forward(params, copies, cfg)

    class_masks, max_masks = extract_masks(preds, class_id, mode)
    return class_masks, max_masks


def compute_augmented_feature_maps(params, cfg: DeepLabConfig, image_path: str,
                                   filter_class_id: int, mode: str = "argmax",
                                   num_aug: int = 100, angle_max: float = 0.5,
                                   shift_max: float = 30, image_size=(512, 512),
                                   chunk_size: int = 0,
                                   dest_folder: Optional[str] = None,
                                   seed: int = 1234,
                                   shared_tta: bool = False):
    """Host-side wrapper with the reference's signature/side effects
    (augmentation_utils.py:62-138): load image, draw augmentations, run the
    fused on-device pipeline, optionally stage to hdf5.

    shared_tta=True stages every image with the SAME augmentation set (the
    seed's draw, no per-image fold-in). The reference redraws per image only
    because np.random state advances between calls; a fixed set is
    statistically equivalent (tests/test_gram.py::
    test_shared_tta_set_quality_equivalent) and lets downstream solvers
    reuse ONE Gram stencil for the whole staged directory
    (SR_single_class / sweeps).

    Returns (class_masks, max_masks, angles, shifts, image_name).
    """
    import os

    import numpy as np

    from ..data.io import load_image, write_augmented_hdf5

    image_name = os.path.splitext(os.path.basename(image_path))[0]
    image = load_image(image_path, image_size=image_size, normalize=True)

    # Per-image key derived from (seed, image name) so regeneration of any
    # subset reproduces the same augmentations; one shared key in
    # shared-TTA mode.
    key = jax.random.key(seed)
    if not shared_tta:
        key = jax.random.fold_in(key, abs(hash(image_name)) % (2 ** 31))
    angles, shifts = sample_augmentations(key, num_aug, angle_max, shift_max)

    class_masks, max_masks = augmented_feature_maps(
        params, jnp.asarray(image), angles, shifts, cfg, filter_class_id,
        mode, num_aug, chunk_size, angle_max=max(float(angle_max), 1e-3))

    class_masks = np.asarray(class_masks)
    max_masks = np.asarray(max_masks) if max_masks is not None else []
    angles_np = np.asarray(angles)
    shifts_np = np.asarray(shifts)

    if dest_folder is not None:
        write_augmented_hdf5(dest_folder, image_name, class_masks, angles_np,
                             shifts_np, mode, angle_max, shift_max,
                             max_masks=max_masks if mode == "slice_max" else None)

    return class_masks, max_masks, angles_np, shifts_np, image_name
