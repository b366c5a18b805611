"""Affine image warps with tfa.image.{rotate,translate} semantics.

The reference augments images with ``tfa.image.rotate`` followed by
``tfa.image.translate`` (reference superresolution_scripts/
augmentation_utils.py:22-25 and superresolution.py:61-64), both thin wrappers
over TF's ``ImageProjectiveTransformV3`` kernel: for every output pixel
(x, y) the projective transform [a0 a1 a2; b0 b1 b2; c0 c1 1] gives the input
sampling point, which is read bilinearly with constant (0) fill for any
neighbor outside the image.

This module is the XLA reference implementation (gathers + lerp). The hot SR
loop instead uses the Paeth shear decomposition (``shear_warp.py``) with the
Pallas kernel in ``pallas_shear.py``; all are exercised against TF goldens in
tests/test_warp.py and tests/test_shear_warp.py.

Transform convention (identical to TF):
  x_in = (a0 * x_out + a1 * y_out + a2) / (c0 * x_out + c1 * y_out + 1)
  y_in = (b0 * x_out + b1 * y_out + b2) / (c0 * x_out + c1 * y_out + 1)
with transforms packed as length-8 vectors [a0,a1,a2,b0,b1,b2,c0,c1].
"""

import jax
import jax.numpy as jnp


def rotation_transform(angles: jnp.ndarray, image_height: int, image_width: int) -> jnp.ndarray:
    """Length-8 projective transforms for CCW rotation about the image center.

    Matches tfa.image.angles_to_projective_transforms: a positive angle
    rotates the image counterclockwise.
    """
    angles = jnp.atleast_1d(jnp.asarray(angles, jnp.float32))
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    w = image_width - 1.0
    h = image_height - 1.0
    x_offset = (w - (cos * w - sin * h)) / 2.0
    y_offset = (h - (sin * w + cos * h)) / 2.0
    zeros = jnp.zeros_like(cos)
    return jnp.stack(
        [cos, -sin, x_offset, sin, cos, y_offset, zeros, zeros], axis=-1
    )


def translation_transform(translations: jnp.ndarray) -> jnp.ndarray:
    """Length-8 transforms shifting content by (dx, dy) pixels (tfa.translate)."""
    t = jnp.atleast_2d(jnp.asarray(translations, jnp.float32))
    dx, dy = t[..., 0], t[..., 1]
    ones = jnp.ones_like(dx)
    zeros = jnp.zeros_like(dx)
    return jnp.stack([ones, zeros, -dx, zeros, ones, -dy, zeros, zeros], axis=-1)


def compose_transforms(first: jnp.ndarray, second: jnp.ndarray) -> jnp.ndarray:
    """Transform equivalent to applying ``first`` then ``second`` to an image.

    Output coords go through ``second`` then ``first`` (matrix product
    M_first @ M_second in the coordinate-mapping direction).
    """

    def to_mat(t):
        row = jnp.stack(
            [t[..., 0], t[..., 1], t[..., 2],
             t[..., 3], t[..., 4], t[..., 5],
             t[..., 6], t[..., 7], jnp.ones_like(t[..., 0])], axis=-1
        )
        return row.reshape(t.shape[:-1] + (3, 3))

    m = to_mat(first) @ to_mat(second)
    m = m / m[..., 2:3, 2:3]
    flat = m.reshape(m.shape[:-2] + (9,))
    return flat[..., :8]


def _bilinear_sample(image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                     fill_value: float) -> jnp.ndarray:
    """Sample HWC ``image`` at float coords; out-of-range neighbors read fill."""
    h, w = image.shape[0], image.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def read(ix, iy):
        valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        ic = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        jc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        vals = image[jc, ic]
        return jnp.where(valid[..., None], vals, fill_value)

    v00 = read(x0, y0)
    v01 = read(x0 + 1, y0)
    v10 = read(x0, y0 + 1)
    v11 = read(x0 + 1, y0 + 1)
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def _nearest_sample(image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                    fill_value: float) -> jnp.ndarray:
    h, w = image.shape[0], image.shape[1]
    ix = jnp.round(x)
    iy = jnp.round(y)
    valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
    ic = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
    jc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
    vals = image[jc, ic]
    return jnp.where(valid[..., None], vals, fill_value)


def _warp_one(image: jnp.ndarray, transform: jnp.ndarray, out_h: int, out_w: int,
              interpolation: str, fill_value: float) -> jnp.ndarray:
    yy = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    a0, a1, a2, b0, b1, b2, c0, c1 = [transform[i] for i in range(8)]
    denom = c0 * xx + c1 * yy + 1.0
    x_in = (a0 * xx + a1 * yy + a2) / denom
    y_in = (b0 * xx + b1 * yy + b2) / denom
    if interpolation == "bilinear":
        return _bilinear_sample(image, x_in, y_in, fill_value)
    elif interpolation == "nearest":
        return _nearest_sample(image, x_in, y_in, fill_value)
    raise ValueError(f"Unsupported interpolation: {interpolation!r}")


def affine_warp(images: jnp.ndarray, transforms: jnp.ndarray,
                interpolation: str = "bilinear", fill_value: float = 0.0,
                output_shape=None) -> jnp.ndarray:
    """Batched projective warp matching TF ImageProjectiveTransformV3.

    Args:
      images: (B, H, W, C) or (H, W, C).
      transforms: (B, 8) or (8,) length-8 projective transforms (see module
        docstring). A single transform broadcasts over the batch.
      interpolation: "bilinear" or "nearest".
      fill_value: value produced for out-of-image samples.
      output_shape: optional (out_h, out_w); defaults to the input size.
    """
    single = images.ndim == 3
    if single:
        images = images[None]
    transforms = jnp.atleast_2d(jnp.asarray(transforms, jnp.float32))
    if transforms.shape[0] == 1 and images.shape[0] != 1:
        transforms = jnp.broadcast_to(transforms, (images.shape[0], 8))
    out_h, out_w = output_shape or (images.shape[1], images.shape[2])

    warped = jax.vmap(
        lambda im, tr: _warp_one(im, tr, out_h, out_w, interpolation, fill_value)
    )(images, transforms)
    return warped[0] if single else warped


def rotate(images: jnp.ndarray, angles: jnp.ndarray,
           interpolation: str = "bilinear", fill_value: float = 0.0) -> jnp.ndarray:
    """tfa.image.rotate: CCW rotation about the center, constant fill."""
    h, w = (images.shape[-3], images.shape[-2])
    return affine_warp(images, rotation_transform(angles, h, w),
                       interpolation=interpolation, fill_value=fill_value)


def translate(images: jnp.ndarray, translations: jnp.ndarray,
              interpolation: str = "bilinear", fill_value: float = 0.0) -> jnp.ndarray:
    """tfa.image.translate: shift content by (dx, dy), constant fill."""
    return affine_warp(images, translation_transform(translations),
                       interpolation=interpolation, fill_value=fill_value)


def rotate_translate_fused(images: jnp.ndarray, angles: jnp.ndarray,
                           shifts: jnp.ndarray, interpolation: str = "bilinear",
                           fill_value: float = 0.0) -> jnp.ndarray:
    """Rotate-then-translate in a single resample.

    One bilinear resample instead of the reference's two sequential warps:
    faster and *less* lossy (no double interpolation). Not bit-identical to
    the two-pass reference path; use rotate()+translate() for strict parity.
    """
    h, w = (images.shape[-3], images.shape[-2])
    composed = compose_transforms(rotation_transform(angles, h, w),
                                  translation_transform(shifts))
    return affine_warp(images, composed, interpolation=interpolation,
                       fill_value=fill_value)
