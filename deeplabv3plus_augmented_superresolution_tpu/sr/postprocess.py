"""Thresholding and coefficient helpers (reference superres_utils.py:118-151)."""

from typing import Optional

import jax.numpy as jnp
import numpy as np


def threshold_image(image: jnp.ndarray, th_value, th_factor: float = 0.15,
                    th_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Pixelwise threshold to {0, th_value}.

    With th_mask: image >= th_mask wins (slice_max class-vs-max contest,
    reference superres_utils.py:133-134); else threshold at
    th_factor * max(image) (reference :136-137, strict >).
    """
    image = jnp.asarray(image)
    if th_mask is not None:
        return jnp.where(image >= th_mask, th_value, 0)
    max_value = image.max().astype(jnp.float32) * th_factor
    return jnp.where(image > max_value, th_value, 0)


def normalize_coefficients(coeff_dict: dict) -> dict:
    """Scale lambda coefficients to sum to one (reference superres_utils.py:142-151)."""
    normalizer = float(np.sum(list(coeff_dict.values())))
    return {k: v / normalizer for k, v in coeff_dict.items()}
