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

__all__ = [
    "IGNORE_LABEL",
    "NUM_CLASSES",
    "compute_iou",
    "mean_iou",
    "single_class_iou",
    "sparse_accuracy_ignoring_last_label",
    "sparse_crossentropy_ignoring_last_label",
    "sparse_mean_iou",
]

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


# ---------------------------------------------------------------------------
# Training-time metrics (reference utils.py:41-91 — unused by the reference's
# entry points but part of its public surface; provided for parity).
# ---------------------------------------------------------------------------

def sparse_crossentropy_ignoring_last_label(y_true, y_pred):
    """Per-pixel softmax CE from logits, ignoring label 255 via the one-hot
    "+1 class then drop" construction (reference utils.py:41-46)."""
    y_true = jnp.asarray(y_true)
    y_pred = jnp.asarray(y_pred)
    nb_classes = y_pred.shape[-1]
    labels = y_true[..., 0].astype(jnp.int32)
    one_hot = jax.nn.one_hot(labels, nb_classes + 1)[..., :-1]
    log_softmax = jax.nn.log_softmax(y_pred, axis=-1)
    return -jnp.sum(one_hot * log_softmax, axis=-1)


def sparse_accuracy_ignoring_last_label(y_true, y_pred):
    """Pixel accuracy over non-255 labels (reference utils.py:49-59)."""
    y_pred = jnp.asarray(y_pred)
    nb_classes = y_pred.shape[-1]
    pred = jnp.argmax(y_pred.reshape(-1, nb_classes), axis=-1)
    true = jnp.reshape(jnp.asarray(y_true), (-1,)).astype(jnp.int32)
    legal = true != IGNORE_LABEL
    right = jnp.sum(legal & (true == pred))
    return right.astype(jnp.float32) / jnp.sum(legal).astype(jnp.float32)


def sparse_mean_iou(y_true, y_pred):
    """Batched mean IoU from logits (reference utils.py:62-91): per class,
    IoU averaged over batch elements containing the class; classes absent
    everywhere are dropped."""
    y_pred = jnp.asarray(y_pred)
    nb_classes = y_pred.shape[-1]
    pred = jnp.argmax(y_pred, axis=-1).reshape(y_pred.shape[0], -1)
    true = jnp.asarray(y_true).reshape(y_pred.shape[0], -1).astype(jnp.int32)
    classes = jnp.arange(nb_classes)
    t_eq = true[None] == classes[:, None, None]     # (C, B, P)
    p_eq = pred[None] == classes[:, None, None]
    inter = jnp.sum(t_eq & p_eq, axis=-1).astype(jnp.float32)
    union = jnp.sum(t_eq | p_eq, axis=-1).astype(jnp.float32)
    legal = jnp.sum(t_eq, axis=-1) > 0              # (C, B)
    per_class = jnp.sum(jnp.where(legal, inter / union, 0.0), axis=1) / \
        jnp.maximum(jnp.sum(legal, axis=1), 1)
    present = jnp.any(legal, axis=1)
    return jnp.sum(jnp.where(present, per_class, 0.0)) / jnp.sum(present)
