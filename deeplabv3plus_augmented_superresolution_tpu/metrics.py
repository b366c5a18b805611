"""IoU metrics matching the reference's evaluation semantics (utils.py:151-230).

All functions are pure jnp and jit-friendly: the reference's dynamic
``tf.unique`` over present labels becomes a fixed loop over the 21 VOC
classes masked by presence, which is numerically identical for VOC label
images (values 0..20 plus 255 ignore).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NUM_CLASSES = 21
IGNORE_LABEL = 255


def _flat_int(x) -> jnp.ndarray:
    return jnp.reshape(jnp.asarray(x), (-1,)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("num_classes",))
def mean_iou(y_true, y_pred, num_classes: int = NUM_CLASSES) -> jnp.ndarray:
    """Mean IoU over classes present in the ground truth, excluding 255
    (reference utils.py:151-177)."""
    t = _flat_int(y_true)
    p = _flat_int(y_pred)
    classes = jnp.arange(num_classes)
    t_eq = t[None, :] == classes[:, None]
    p_eq = p[None, :] == classes[:, None]
    inter = jnp.sum(t_eq & p_eq, axis=1).astype(jnp.float32)
    union = jnp.sum(t_eq | p_eq, axis=1).astype(jnp.float32)
    present = jnp.any(t_eq, axis=1)
    iou = inter / union  # union==0 -> nan, but such classes are not present
    return jnp.sum(jnp.where(present, iou, 0.0)) / jnp.sum(present)


@partial(jax.jit, static_argnames=("class_id", "include_bg"))
def single_class_iou(y_true, y_pred, class_id: int, include_bg: bool = False
                     ) -> jnp.ndarray:
    """IoU of one class, optionally averaged with background IoU after
    mapping every other GT class to background (reference utils.py:180-204).
    Classes with empty union produce NaN and are dropped from the mean."""
    t = _flat_int(y_true)
    p = _flat_int(y_pred)

    def iou_of(t_, p_, cid):
        te = t_ == cid
        pe = p_ == cid
        inter = jnp.sum(te & pe).astype(jnp.float32)
        union = jnp.sum(te | pe).astype(jnp.float32)
        return inter / union  # nan when union == 0

    ious = [iou_of(t, p, class_id)]
    if include_bg:
        t_bg = jnp.where(t != class_id, 0, t)
        ious.append(iou_of(t_bg, p, 0))
    ious = jnp.stack(ious)
    legal = ~jnp.isnan(ious)
    return jnp.sum(jnp.where(legal, ious, 0.0)) / jnp.sum(legal)


def compute_iou(true_image, image, img_size=(512, 512),
                class_id: Optional[int] = None, include_bg: bool = False) -> float:
    """Dispatcher mirroring reference utils.py:207-230 (flatten + dispatch)."""
    del img_size  # flattening handles any shape
    if class_id is not None:
        return float(single_class_iou(true_image, image, class_id, include_bg))
    return float(mean_iou(true_image, image))
