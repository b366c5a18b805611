"""Host-side (CPU) image augmentation library.

Counterpart of the reference's data_scripts/image_utils.py (cv2/PIL-based
pad/crop/flip/zoom/rotate/photometric ops, label<->color codecs and a
composed random_transform pipeline — reference image_utils.py:23-504). These
run on the host data-loading path only; the on-device TTA warps live in
ops/. Implemented on numpy + cv2.
"""

import random
from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in this image
    cv2 = None

from .voc import voc_colormap


def imread(path: str) -> np.ndarray:
    """BGR->RGB read (reference image_utils.py imread)."""
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 3 and img.shape[2] >= 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img


def imwrite(path: str, image: np.ndarray) -> None:
    out = image
    if image.ndim == 3 and image.shape[2] >= 3:
        out = cv2.cvtColor(image, cv2.COLOR_RGB2BGR)
    cv2.imwrite(path, out)


def pad_to(image: np.ndarray, size: Tuple[int, int], value=0) -> np.ndarray:
    h, w = image.shape[:2]
    th, tw = size
    top = max(0, (th - h) // 2)
    bottom = max(0, th - h - top)
    left = max(0, (tw - w) // 2)
    right = max(0, tw - w - left)
    border = ((top, bottom), (left, right)) + ((0, 0),) * (image.ndim - 2)
    return np.pad(image, border, constant_values=value)


def center_crop(image: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    h, w = image.shape[:2]
    th, tw = size
    y0 = max(0, (h - th) // 2)
    x0 = max(0, (w - tw) // 2)
    return image[y0:y0 + th, x0:x0 + tw]


def random_crop(image: np.ndarray, mask: np.ndarray, size: Tuple[int, int],
                rng: Optional[random.Random] = None):
    rng = rng or random
    h, w = image.shape[:2]
    th, tw = size
    y0 = rng.randint(0, max(0, h - th))
    x0 = rng.randint(0, max(0, w - tw))
    return image[y0:y0 + th, x0:x0 + tw], mask[y0:y0 + th, x0:x0 + tw]


def flip_horizontal(image: np.ndarray) -> np.ndarray:
    return image[:, ::-1]


def zoom(image: np.ndarray, factor: float, interpolation=None) -> np.ndarray:
    """Scale about the center, keeping the original frame size."""
    interpolation = interpolation or cv2.INTER_LINEAR
    h, w = image.shape[:2]
    scaled = cv2.resize(image, (max(1, int(w * factor)), max(1, int(h * factor))),
                        interpolation=interpolation)
    if factor >= 1.0:
        return center_crop(scaled, (h, w))
    return pad_to(scaled, (h, w))


def rotate(image: np.ndarray, angle_deg: float, interpolation=None) -> np.ndarray:
    """Rotate about the center with constant fill (host path; degrees)."""
    interpolation = interpolation or cv2.INTER_LINEAR
    h, w = image.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle_deg, 1.0)
    return cv2.warpAffine(image, m, (w, h), flags=interpolation,
                          borderMode=cv2.BORDER_CONSTANT)


def adjust_saturation(image: np.ndarray, factor: float) -> np.ndarray:
    hsv = cv2.cvtColor(image.astype(np.uint8), cv2.COLOR_RGB2HSV).astype(np.float32)
    hsv[..., 1] = np.clip(hsv[..., 1] * factor, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def adjust_brightness(image: np.ndarray, delta: float) -> np.ndarray:
    return np.clip(image.astype(np.float32) + delta, 0, 255).astype(image.dtype)


def adjust_contrast(image: np.ndarray, factor: float) -> np.ndarray:
    mean = image.astype(np.float32).mean(axis=(0, 1), keepdims=True)
    return np.clip((image - mean) * factor + mean, 0, 255).astype(image.dtype)


def blur(image: np.ndarray, ksize: int = 3) -> np.ndarray:
    return cv2.GaussianBlur(image, (ksize | 1, ksize | 1), 0)


def labels_to_colors(label_img: np.ndarray) -> np.ndarray:
    """Label indices -> VOC palette RGB (reference image_utils label codecs)."""
    cmap = voc_colormap()
    return cmap[np.clip(label_img.astype(np.int32), 0, 255)]


def colors_to_labels(color_img: np.ndarray) -> np.ndarray:
    """VOC palette RGB -> label indices (inverse codec)."""
    cmap = voc_colormap()
    lookup = {tuple(c): i for i, c in enumerate(cmap)}
    flat = color_img.reshape(-1, 3)
    out = np.array([lookup.get(tuple(px), 255) for px in flat], dtype=np.uint8)
    return out.reshape(color_img.shape[:2])


def random_transform(image: np.ndarray, mask: np.ndarray, seed: Optional[int] = None,
                     flip_prob: float = 0.5, zoom_range=(0.8, 1.2),
                     rotate_range=(-10.0, 10.0), brightness_range=(-20, 20),
                     crop_size: Optional[Tuple[int, int]] = None):
    """Composed geometric+photometric augmentation (reference
    image_utils.py:437-504): geometric ops apply to image AND mask (nearest
    for the mask), photometric to the image only."""
    rng = random.Random(seed)
    if rng.random() < flip_prob:
        image, mask = flip_horizontal(image), flip_horizontal(mask)
    z = rng.uniform(*zoom_range)
    image = zoom(image, z)
    mask = zoom(mask, z, interpolation=cv2.INTER_NEAREST)
    angle = rng.uniform(*rotate_range)
    image = rotate(image, angle)
    mask = rotate(mask, angle, interpolation=cv2.INTER_NEAREST)
    image = adjust_brightness(image, rng.uniform(*brightness_range))
    if crop_size is not None:
        image, mask = random_crop(image, mask, crop_size, rng)
    return image, mask
