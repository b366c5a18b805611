"""Procedural synthetic segmentation scenes (numpy, host-side).

Purpose: quality evidence without egress. The reference's quality numbers
come from PASCAL VOC + the downloaded bonlime checkpoint (reference
model.py:129-145, BASELINE.md) — neither is fetchable in this container.
These scenes give a dataset the real DeepLabV3+ architecture can be trained
on in minutes (models/train.py), after which the full 512-px ASR pipeline
runs with a *genuinely trained* model and the reference's headline
ASR-vs-standard IoU comparison becomes measurable end to end
(scripts/quality_demo.py).

Scene recipe: a smooth low-frequency color background plus 1..max_shapes
anti-learnable-free foreground shapes (rotated ellipses / rectangles /
triangles). Class identity is carried by color family (one hue band per
class id), geometry is random — so the model must learn color+locality, and
the recovered masks have the curved/angled HR boundaries super-resolution is
about. Labels follow VOC conventions: 0 = background, class ids as given,
255 = ignore on a ~2 px shape contour (like VOC's void contours, reference
data: SegmentationClass borders).
"""

from typing import Sequence, Tuple

import numpy as np

# Hue bands (RGB base colors) assigned to class ids in order. Backgrounds
# draw from muted grey-greens far from all bands.
_CLASS_COLORS = [
    (0.85, 0.25, 0.20),   # red-ish
    (0.20, 0.35, 0.85),   # blue-ish
    (0.90, 0.80, 0.20),   # yellow-ish
    (0.60, 0.20, 0.75),   # purple-ish
    (0.95, 0.55, 0.15),   # orange-ish
    (0.15, 0.75, 0.70),   # teal-ish
]


def _rotated_coords(h: int, w: int, cy: float, cx: float, theta: float):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    yy = yy - cy
    xx = xx - cx
    c, s = np.cos(theta), np.sin(theta)
    return c * yy - s * xx, s * yy + c * xx


def _shape_mask(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """One random rotated ellipse/rectangle/triangle mask (bool (h, w))."""
    kind = rng.integers(0, 3)
    cy = rng.uniform(0.25 * h, 0.75 * h)
    cx = rng.uniform(0.25 * w, 0.75 * w)
    ry = rng.uniform(0.08 * h, 0.22 * h)
    rx = rng.uniform(0.08 * w, 0.22 * w)
    theta = rng.uniform(0, np.pi)
    u, v = _rotated_coords(h, w, cy, cx, theta)
    if kind == 0:      # ellipse
        return (u / ry) ** 2 + (v / rx) ** 2 <= 1.0
    if kind == 1:      # rectangle
        return (np.abs(u) <= ry) & (np.abs(v) <= rx)
    # triangle: isoceles in the rotated frame
    return (u >= -ry) & (u <= ry) & (np.abs(v) <= rx * (ry - u) / (2 * ry))


def _contour(mask: np.ndarray) -> np.ndarray:
    """~2 px inner+outer contour of a boolean mask (4-neighborhood)."""
    pad = np.pad(mask, 1)
    neigh = (pad[:-2, 1:-1] | pad[2:, 1:-1] | pad[1:-1, :-2] | pad[1:-1, 2:])
    inner = mask & ~(pad[:-2, 1:-1] & pad[2:, 1:-1]
                     & pad[1:-1, :-2] & pad[1:-1, 2:])
    outer = ~mask & neigh
    return inner | outer


def synthetic_scene(rng: np.random.Generator, size: Tuple[int, int] = (512, 512),
                    class_ids: Sequence[int] = (8, 12), max_shapes: int = 3,
                    void_contour: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """One scene. Returns (image f32 (H, W, 3) in [0, 1], label int32 (H, W))."""
    h, w = size
    # Background: blend three muted colors along two random linear gradients.
    gx = np.linspace(0, 1, w, dtype=np.float32)[None, :, None]
    gy = np.linspace(0, 1, h, dtype=np.float32)[:, None, None]
    c = rng.uniform(0.25, 0.55, (3, 1, 1, 3)).astype(np.float32)
    img = c[0] + (c[1] - c[0]) * gx + (c[2] - c[0]) * gy
    label = np.zeros((h, w), np.int32)

    n_shapes = int(rng.integers(1, max_shapes + 1))
    for _ in range(n_shapes):
        k = int(rng.integers(0, len(class_ids)))
        base = np.asarray(_CLASS_COLORS[k % len(_CLASS_COLORS)], np.float32)
        color = np.clip(base + rng.uniform(-0.08, 0.08, 3), 0, 1).astype(np.float32)
        mask = _shape_mask(rng, h, w)
        img = np.where(mask[..., None], color, img)
        label = np.where(mask, np.int32(class_ids[k]), label)
        if void_contour:
            label = np.where(_contour(mask), np.int32(255), label)

    img = img + rng.normal(0, 0.03, img.shape).astype(np.float32)
    return np.clip(img, 0, 1).astype(np.float32), label


def synthetic_batch(rng: np.random.Generator, n: int,
                    size: Tuple[int, int] = (512, 512),
                    class_ids: Sequence[int] = (8, 12), max_shapes: int = 3,
                    void_contour: bool = True,
                    require_class: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """n scenes stacked: (images (n, H, W, 3), labels (n, H, W)).

    require_class: if nonzero, redraw scenes until each contains that class
    (like the reference's filter_images_by_class staging,
    reference superres_utils.py:41-53).
    """
    images, labels = [], []
    while len(images) < n:
        img, lab = synthetic_scene(rng, size, class_ids, max_shapes,
                                   void_contour)
        if require_class and not np.any(lab == require_class):
            continue
        images.append(img)
        labels.append(lab)
    return np.stack(images), np.stack(labels)
