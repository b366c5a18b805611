"""Image-gradient / total-variation terms for the SR loss.

Matches tf.image.image_gradients semantics (zero-padded last row/col) used by
the reference TV term (superresolution.py:81-83) and the bilateral-TV variant
(superresolution.py:8-23).
"""

import jax.numpy as jnp


def image_gradients(image: jnp.ndarray):
    """(B, H, W, C) -> (dy, dx), each zero-padded at the bottom/right edge."""
    dy = image[:, 1:, :, :] - image[:, :-1, :, :]
    dx = image[:, :, 1:, :] - image[:, :, :-1, :]
    dy = jnp.pad(dy, ((0, 0), (0, 1), (0, 0), (0, 0)))
    dx = jnp.pad(dx, ((0, 0), (0, 0), (0, 1), (0, 0)))
    return dy, dx


def total_variation(image: jnp.ndarray) -> jnp.ndarray:
    """Anisotropic TV: sum |dy| + |dx| (reference superresolution.py:81-83)."""
    dy, dx = image_gradients(image)
    return jnp.sum(jnp.abs(dy) + jnp.abs(dx))


def _integer_translate(image: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """Zero-fill shift of (..., H, W, C) content by integer (+dx right,
    +dy down): out[y, x] = in[y-dy, x-dx] — exactly tfa.translate's nearest
    resample at integer offsets, as static pad+slice so it compiles to pure
    (fuseable) memory ops instead of a general resampler."""
    h, w = image.shape[-3], image.shape[-2]
    py, px = abs(dy), abs(dx)
    pad = [(0, 0)] * (image.ndim - 3) + [(py, py), (px, px), (0, 0)]
    padded = jnp.pad(image, pad)
    y0, x0 = py - dy, px - dx
    return padded[..., y0:y0 + h, x0:x0 + w, :]


def bilateral_tv(image: jnp.ndarray, alpha: float = 0.6,
                 shift_factor: int = 2) -> jnp.ndarray:
    """Bilateral TV (reference superresolution.py:8-23): L1 norms of
    differences against integer-shifted copies, weighted alpha^(|h|+|v|).

    The reference shifts with tfa.translate (nearest); the offsets are
    integers, so each shifted copy is computed here as a STATIC zero-fill
    pad+slice (bit-identical result, `_integer_translate`) rather than a
    general affine resample — inside the solver's per-iteration
    value_and_grad the resampler version cost ~85 ms/iteration on a v5e
    (~35 s per 400-iteration solve, making use_BTV sweep trials ~50x more
    expensive than TV ones); the static form fuses into the update step.
    """
    total = jnp.zeros((), image.dtype)
    for dx in range(-shift_factor, shift_factor + 1):
        for dy in range(0, shift_factor + 1):
            shifted = _integer_translate(image, dx, dy)
            weight = alpha ** (abs(dx) + abs(dy))
            total = total + weight * jnp.sum(jnp.abs(image - shifted))
    return total
