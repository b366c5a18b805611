"""Output Processing Modes (OPMs): per-copy LR mask extraction.

Mirrors the per-prediction OPM loop of the reference
(augmentation_utils.py:80-115), but as batched pure functions over the whole
(num_aug, h, w, classes) prediction stack — one fused XLA op sequence instead
of an eager host loop per copy.

Modes:
  argmax:    argmax over classes, keep pixels == class_id (value class_id),
             cast float (reference augmentation_utils.py:106-113)
  slice:     class-channel slice min-max normalized to [0,1] by the *whole*
             prediction's min/max, per copy (reference :95-104)
  slice_max: raw class-channel slice + pixelwise max over the other channels
             (reference :82-93)
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

MODES = ("argmax", "slice", "slice_max")


def min_max_normalization(image: jnp.ndarray, new_min: float = 0.0,
                          new_max: float = 255.0,
                          global_min: Optional[jnp.ndarray] = None,
                          global_max: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Reference superres_utils.py:56-62 (den==0 guarded to 1)."""
    mn = image.min() if global_min is None else global_min
    mx = image.max() if global_max is None else global_max
    num = (image - mn) * (new_max - new_min)
    den = mx - mn
    den = jnp.where(den == 0, 1.0, den)
    return new_min + num / den


def extract_masks(predictions: jnp.ndarray, class_id: int, mode: str = "argmax"
                  ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """(N, h, w, C) logits -> (class_masks (N, h, w, 1), max_masks or None)."""
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")

    if mode == "argmax":
        labels = jnp.argmax(predictions, axis=-1)[..., None]
        class_masks = jnp.where(labels == class_id, labels, 0).astype(jnp.float32)
        return class_masks, None

    class_masks = predictions[..., class_id:class_id + 1].astype(jnp.float32)

    if mode == "slice":
        # Normalized per copy by the global min/max over all 21 channels.
        gmin = predictions.min(axis=(-3, -2, -1), keepdims=True)
        gmax = predictions.max(axis=(-3, -2, -1), keepdims=True)
        class_masks = min_max_normalization(class_masks, 0.0, 1.0,
                                            global_min=gmin, global_max=gmax)
        return class_masks, None

    # slice_max
    num_classes = predictions.shape[-1]
    others = jnp.where(
        jnp.arange(num_classes) == class_id, -jnp.inf, 0.0
    ) + predictions
    max_masks = others.max(axis=-1, keepdims=True).astype(jnp.float32)
    return class_masks, max_masks


def extract_masks_multiclass(predictions: jnp.ndarray, class_ids: jnp.ndarray,
                             mode: str = "argmax"
                             ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Multi-class OPM: (N, h, w, C) logits + (K,) class ids ->
    ((K, N, h, w, 1) class masks, (K, N, h, w, 1) max masks or None).

    The reference is single-class per run (README.md:5-6); here the
    class-independent work (argmax labels / per-copy global min-max) is
    computed once and the per-class selection is vmapped over the class axis,
    so K classes cost one forward pass plus K cheap selections. Per-class
    results match extract_masks(predictions, class_ids[k], mode) exactly.
    """
    class_ids = jnp.asarray(class_ids, jnp.int32)
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")

    if mode == "argmax":
        labels = jnp.argmax(predictions, axis=-1)[..., None]  # shared
        masks = jax.vmap(
            lambda c: jnp.where(labels == c, labels, 0).astype(jnp.float32)
        )(class_ids)
        return masks, None

    def take_channel(c):
        return jnp.take(predictions, c, axis=-1)[..., None].astype(jnp.float32)

    if mode == "slice":
        gmin = predictions.min(axis=(-3, -2, -1), keepdims=True)  # shared
        gmax = predictions.max(axis=(-3, -2, -1), keepdims=True)
        masks = jax.vmap(
            lambda c: min_max_normalization(take_channel(c), 0.0, 1.0,
                                            global_min=gmin, global_max=gmax)
        )(class_ids)
        return masks, None

    # slice_max
    num_classes = predictions.shape[-1]

    def per_class(c):
        others = jnp.where(
            jnp.arange(num_classes) == c, -jnp.inf, 0.0
        ) + predictions
        return take_channel(c), others.max(axis=-1, keepdims=True).astype(jnp.float32)

    return jax.vmap(per_class)(class_ids)


def normalize_stack(masks: jnp.ndarray, global_normalize: bool = True) -> jnp.ndarray:
    """The load-time [0,1] normalization applied to argmax / slice_max stacks
    (reference superres_utils.py:186-206): min/max over the whole stack when
    global_normalize else per copy."""
    if global_normalize:
        return min_max_normalization(masks, 0.0, 1.0,
                                     global_min=masks.min(), global_max=masks.max())
    mn = masks.min(axis=(-3, -2, -1), keepdims=True)
    mx = masks.max(axis=(-3, -2, -1), keepdims=True)
    return min_max_normalization(masks, 0.0, 1.0, global_min=mn, global_max=mx)


def prepare_sr_inputs(class_masks: jnp.ndarray,
                      max_masks: Optional[jnp.ndarray],
                      mode: str, global_normalize: bool = True
                      ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Replicates load_SR_data's normalization on in-memory stacks
    (reference superres_utils.py:154-210): 'slice' is already normalized at
    extraction; other modes are normalized here; slice_max also normalizes
    the max stack."""
    if mode != "slice":
        class_masks = normalize_stack(class_masks, global_normalize)
    if mode == "slice_max" and max_masks is not None:
        max_masks = normalize_stack(max_masks, global_normalize)
    return class_masks, max_masks


def create_mask(prediction: jnp.ndarray) -> jnp.ndarray:
    """Argmax label image with trailing channel dim (reference utils.py:115-119)."""
    return jnp.argmax(prediction, axis=-1)[..., None]


def get_prediction(apply_fn, params, image: jnp.ndarray) -> jnp.ndarray:
    """Single-image forward -> argmax mask (reference utils.py:122-127:
    model.predict on a batch of one, then create_mask of the first output).

    apply_fn: the (params, batch) forward from models.build_model."""
    prediction = apply_fn(params, image[None])
    return create_mask(prediction[0])
