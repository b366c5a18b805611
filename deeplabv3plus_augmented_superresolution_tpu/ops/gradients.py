"""Image-gradient / total-variation terms for the SR loss.

Matches tf.image.image_gradients semantics (zero-padded last row/col) used by
the reference TV term (superresolution.py:81-83) and the bilateral-TV variant
(superresolution.py:8-23).
"""

import jax.numpy as jnp

from .warp import translate


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


def bilateral_tv(image: jnp.ndarray, alpha: float = 0.6,
                 shift_factor: int = 2) -> jnp.ndarray:
    """Bilateral TV (reference superresolution.py:8-23): L1 norms of
    differences against integer-shifted copies, weighted alpha^(|h|+|v|).

    The reference shifts with tfa.translate's default *nearest* interpolation;
    shifts are integers so the warp is exact either way.
    """
    pairs = [(h, v)
             for h in range(-shift_factor, shift_factor + 1)
             for v in range(0, shift_factor + 1)]
    shifts = jnp.asarray(pairs, jnp.float32)
    batched = jnp.broadcast_to(image, (len(pairs),) + image.shape[-3:])
    shifted = translate(batched, shifts, interpolation="nearest")
    l1 = jnp.sum(jnp.abs(batched - shifted), axis=(-3, -2, -1))
    weights = alpha ** jnp.abs(shifts).sum(axis=-1)
    return jnp.sum(weights * l1)
