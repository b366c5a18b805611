"""Augmented-copy generation (reference augmentation_utils.py:11-27).

jax.random instead of host NumPy RNG: the (angles, shifts) draw happens
on-device and the whole tile->rotate->translate batch is one XLA program.
Copy 0 is always the identity, like the reference. Bit-parity with
np.random.uniform streams is neither possible nor required (SURVEY.md §7);
parity targets are mask/IoU level.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.warp import rotate, translate


def sample_augmentations(key: jax.Array, num_aug: int, angle_max: float,
                         shift_max: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform angles in ±angle_max (rad), shifts in ±shift_max (px, 2D);
    first sample forced to identity."""
    k_angle, k_shift = jax.random.split(key)
    angles = jax.random.uniform(k_angle, (num_aug,), jnp.float32,
                                -angle_max, angle_max)
    shifts = jax.random.uniform(k_shift, (num_aug, 2), jnp.float32,
                                -shift_max, shift_max)
    angles = angles.at[0].set(0.0)
    shifts = shifts.at[0].set(0.0)
    return angles, shifts


@partial(jax.jit, static_argnames=("num_aug", "warp_impl", "angle_max"))
def make_augmented_copies(image: jnp.ndarray, angles: jnp.ndarray,
                          shifts: jnp.ndarray, num_aug: int,
                          warp_impl: str = "shear",
                          angle_max: float = 0.35) -> jnp.ndarray:
    """(H, W, C) image -> (num_aug, H, W, C) rotated+translated copies.

    warp_impl "shear" (default) is the gather-free TPU-fast path;
    "gather" reproduces the reference's two-pass tfa warp bit-for-bit
    (CPU parity tests only — XLA gathers are pathologically slow on TPU).
    """
    batched = jnp.broadcast_to(image[None], (num_aug,) + image.shape)
    if warp_impl == "shear":
        from ..ops.shear_warp import paeth_rotate_translate
        return paeth_rotate_translate(batched, angles, shifts, angle_max)
    return translate(rotate(batched, angles), shifts)


@partial(jax.jit, static_argnames=("angle_max", "shift_max", "prob",
                                   "static_angle_max"))
def warp_augment_batch(key: jax.Array, images: jnp.ndarray,
                       labels: jnp.ndarray, angle_max: float = 0.15,
                       shift_max: float = 80.0, prob: float = 0.5,
                       static_angle_max: float = 0.16
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """TTA-distribution TRAIN-time augmentation.

    Applies the same per-sample random rotation (±angle_max rad) +
    translation (±shift_max px) with zero fill that the ASR pipeline feeds
    the model at TEST time (make_augmented_copies), so the model learns the
    warped-copy statistics — in particular that warped-in black borders are
    BACKGROUND. Why this matters: a model never shown warp borders
    mislabels them and the surrounding content (measured: 28% of valid
    pixels claiming the class vs 8.3% true — the garbage-vote failure mode,
    NOTES.md "CG investigation").

    images: (B, H, W, 3) float; labels: (B, H, W) integer (255 = void).
    Images warp bilinear; labels warp with the label-preserving nearest
    mode (a pixel permutation-with-fill — 255 contours survive) and the
    zero-filled border is labeled 0 = background. Each sample is augmented
    with probability `prob`, else identity — keeping unwarped statistics in
    the batch mix.
    """
    from ..ops.shear_warp import paeth_rotate_translate

    n = images.shape[0]
    k_a, k_s, k_p = jax.random.split(key, 3)
    angles = jax.random.uniform(k_a, (n,), jnp.float32, -angle_max, angle_max)
    shifts = jax.random.uniform(k_s, (n, 2), jnp.float32,
                                -shift_max, shift_max)
    take = (jax.random.uniform(k_p, (n,)) < prob).astype(jnp.float32)
    angles = angles * take
    shifts = shifts * take[:, None]
    out_img = paeth_rotate_translate(images, angles, shifts,
                                     static_angle_max)
    lab = paeth_rotate_translate(labels.astype(jnp.float32), angles, shifts,
                                 static_angle_max, interpolation="nearest")
    return out_img, lab.astype(labels.dtype)


def create_augmented_copies(image: jnp.ndarray, num_aug: int, angle_max: float,
                            shift_max: float, key: jax.Array,
                            warp_impl: str = "shear"):
    """Reference create_augmented_copies signature, returning
    (copies, angles, shifts)."""
    angles, shifts = sample_augmentations(key, num_aug, angle_max, shift_max)
    copies = make_augmented_copies(image, angles, shifts, num_aug,
                                   warp_impl=warp_impl,
                                   angle_max=max(angle_max, 1e-3))
    return copies, angles, shifts
