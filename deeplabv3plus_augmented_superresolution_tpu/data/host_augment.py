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
    # NB: cv2.INTER_NEAREST == 0, so `or` would silently upgrade nearest
    # mask warps to label-blending linear ones.
    if interpolation is None:
        interpolation = cv2.INTER_LINEAR
    h, w = image.shape[:2]
    scaled = cv2.resize(image, (max(1, int(w * factor)), max(1, int(h * factor))),
                        interpolation=interpolation)
    if factor >= 1.0:
        return center_crop(scaled, (h, w))
    return pad_to(scaled, (h, w))


def rotate(image: np.ndarray, angle_deg: float, interpolation=None) -> np.ndarray:
    """Rotate about the center with constant fill (host path; degrees)."""
    # NB: cv2.INTER_NEAREST == 0, so `or` would silently upgrade nearest
    # mask warps to label-blending linear ones.
    if interpolation is None:
        interpolation = cv2.INTER_LINEAR
    h, w = image.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle_deg, 1.0)
    return cv2.warpAffine(image, m, (w, h), flags=interpolation,
                          borderMode=cv2.BORDER_CONSTANT)


def remove_mean(image: np.ndarray) -> np.ndarray:
    """Subtract the ImageNet channel means (B, G, R order — the Keras
    'caffe' preprocessing the reference's FCN-era path used,
    reference image_utils.py:92-105)."""
    return image.astype(np.float32) - np.array([103.939, 116.779, 123.68],
                                               np.float32)


def rotate_expand(image: np.ndarray, angle_deg: float, scale: float = 1.0,
                  interpolation=None, fill=0) -> np.ndarray:
    """Rotate (+optional zoom) about the center onto an EXPANDED canvas that
    contains the whole rotated frame — no content is ever clipped at the
    corners (reference image_utils.py:327-364). GT masks pass
    interpolation=cv2.INTER_NEAREST and fill=ignore_label."""
    # NB: cv2.INTER_NEAREST == 0, so `or` would silently upgrade nearest
    # mask warps to label-blending linear ones.
    if interpolation is None:
        interpolation = cv2.INTER_LINEAR
    h, w = image.shape[:2]
    mat = cv2.getRotationMatrix2D((w // 2, h // 2), angle_deg, scale)
    cos, sin = abs(mat[0, 0]), abs(mat[0, 1])
    out_w = int(round(w * cos + h * sin))
    out_h = int(round(w * sin + h * cos))
    mat[0, 2] += out_w / 2 - w // 2
    mat[1, 2] += out_h / 2 - h // 2
    if np.isscalar(fill):
        fill = (fill, fill, fill)
    return cv2.warpAffine(image, mat, (out_w, out_h), flags=interpolation,
                          borderValue=fill)


def random_rotate(image: np.ndarray, mask: np.ndarray, rotation_range,
                  zoom_range=None, ignore_label: int = 255,
                  rng: Optional[random.Random] = None):
    """Joint expanding rotate+zoom of an image and its labels; out-of-frame
    label pixels become ignore_label (reference image_utils.py:366-384)."""
    rng = rng or random
    angle = rng.uniform(*rotation_range)
    scale = 1.0 if zoom_range is None else rng.uniform(*zoom_range)
    img = rotate_expand(image, angle, scale)
    gt = rotate_expand(mask, angle, scale, interpolation=cv2.INTER_NEAREST,
                       fill=ignore_label)
    return img, gt


def random_blur(image: np.ndarray, ksize_max=(9, 9), sigma_max=(1.5, 1.5),
                rng: Optional[random.Random] = None) -> np.ndarray:
    """Gaussian blur with random odd kernel sizes up to ksize_max and random
    sigmas up to sigma_max (reference image_utils.py:165-185)."""
    rng = rng or random
    kx = rng.randrange(0, ksize_max[0]) | 1
    ky = rng.randrange(0, ksize_max[1]) | 1
    return cv2.GaussianBlur(image, (kx, ky),
                            sigmaX=sigma_max[0] * rng.random(),
                            sigmaY=sigma_max[1] * rng.random())


def adjust_saturation_value(image: np.ndarray, saturation: int = 0,
                            value: int = 0) -> np.ndarray:
    """Shift HSV saturation/value by absolute amounts with saturation-safe
    clipping (reference image_utils.py:215-247)."""
    if saturation == 0 and value == 0:
        return image
    hsv = cv2.cvtColor(image.astype(np.uint8), cv2.COLOR_RGB2HSV)
    hsv = hsv.astype(np.int16)
    hsv[..., 1] = np.clip(hsv[..., 1] + saturation, 0, 255)
    hsv[..., 2] = np.clip(hsv[..., 2] + value, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def adjust_brightness_contrast(image: np.ndarray, brightness: int = 0,
                               contrast: int = 0) -> np.ndarray:
    """Absolute brightness shift + contrast gain about the mid-gray point
    (the standard alpha/gamma formulation, reference image_utils.py:250-285)."""
    out = image.astype(np.float32)
    if brightness:
        lo, hi = (brightness, 255) if brightness > 0 else (0, 255 + brightness)
        out = out * (hi - lo) / 255.0 + lo
    if contrast:
        gain = 131.0 * (contrast + 127) / (127.0 * (131 - contrast))
        out = gain * out + 127.0 * (1.0 - gain)
    return np.clip(out, 0, 255).astype(np.uint8)


def pad_or_crop(image: np.ndarray, size: Tuple[int, int], value=0) -> np.ndarray:
    """Center-pad each axis that is too small and center-crop each axis that
    is too large (reference image_utils.py:301-325)."""
    return center_crop(pad_to(image, size, value=value), size)


def random_shift(image: np.ndarray, mask: np.ndarray, shift_range,
                 ignore_label: int = 255,
                 rng: Optional[random.Random] = None):
    """Translate by up to +-shift_range px via center-pad then random-crop
    back to the original size — the reference's shift mechanism
    (image_utils.py:437-504 'shift_range' docstring)."""
    rng = rng or random
    h, w = image.shape[:2]
    sy, sx = shift_range
    img = pad_to(image, (h + 2 * sy, w + 2 * sx))
    gt = pad_to(mask, (h + 2 * sy, w + 2 * sx), value=ignore_label)
    return random_crop(img, gt, (h, w), rng)


def apply_mask(image: np.ndarray, pred_colors: np.ndarray,
               alpha: float = 0.5) -> np.ndarray:
    """Overlay a colorized prediction onto the image; black (background)
    prediction pixels stay fully transparent (reference image_utils.py:421-435)."""
    fg = np.any(pred_colors != 0, axis=-1, keepdims=True)
    blend = (1 - alpha) * image.astype(np.float32) \
        + alpha * pred_colors.astype(np.float32)
    return np.where(fg, blend, image.astype(np.float32)).astype(np.uint8)


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


def colors_to_labels(color_img: np.ndarray, one_hot: bool = False) -> np.ndarray:
    """VOC palette RGB -> label indices, or a one-hot stack over the 21
    classes when one_hot=True (reference image_utils.py:406-418)."""
    cmap = voc_colormap()
    if one_hot:
        n = 21
        out = np.zeros(color_img.shape[:2] + (n,), np.uint8)
        for i in range(n):
            out[..., i] = np.all(color_img == cmap[i], axis=-1)
        return out
    lookup = {tuple(c): i for i, c in enumerate(cmap)}
    flat = color_img.reshape(-1, 3)
    out = np.array([lookup.get(tuple(px), 255) for px in flat], dtype=np.uint8)
    return out.reshape(color_img.shape[:2])


def random_transform(image: np.ndarray, mask: np.ndarray,
                     target_shape: Optional[Tuple[int, int]] = None,
                     saturation_range=None, value_range=None,
                     brightness_range=None, contrast_range=None,
                     blur_params=None, flip_lr: bool = False,
                     rotation_range=None, shift_range=None, zoom_range=None,
                     ignore_label: int = 255,
                     seed: Optional[int] = None):
    """The composed host augmentation pipeline (reference
    image_utils.py:437-504): photometric adjustments (image only), then the
    joint geometric chain — flip / expanding rotate+zoom (or plain zoom) /
    pad-or-crop to target (+shift_range) / random crop for translation. GT
    fill is always ignore_label; photometric ranges are integer amounts."""
    rng = random.Random(seed)
    img, gt = image, mask
    target_shape = target_shape or img.shape[:2]

    img = adjust_saturation_value(
        img,
        0 if saturation_range is None else rng.randint(*saturation_range),
        0 if value_range is None else rng.randint(*value_range))
    img = adjust_brightness_contrast(
        img,
        0 if brightness_range is None else rng.randint(*brightness_range),
        0 if contrast_range is None else rng.randint(*contrast_range))
    if blur_params is not None:
        img = random_blur(img, blur_params["ksize_max"],
                          blur_params["sigma_max"], rng)

    if flip_lr and rng.random() < 0.5:
        img, gt = flip_horizontal(img), flip_horizontal(gt)

    if rotation_range is not None:
        img, gt = random_rotate(img, gt, rotation_range, zoom_range,
                                ignore_label, rng)
    elif zoom_range is not None:
        z = rng.uniform(*zoom_range)
        img = zoom(img, z)
        gt = zoom(gt, z, interpolation=cv2.INTER_NEAREST)

    padded = (np.asarray(target_shape)
              + (np.asarray(shift_range) if shift_range is not None else 0))
    img = pad_or_crop(img, tuple(padded))
    gt = pad_or_crop(gt, tuple(padded), value=ignore_label)
    if shift_range is not None:
        img, gt = random_crop(img, gt, tuple(target_shape), rng)
    return img, gt


def list_files(pathname):
    """Plain files directly under a directory (reference image_utils.py:23)."""
    import os

    return [f for f in os.listdir(pathname)
            if os.path.isfile(os.path.join(pathname, f))]


def bytes_read(filename):
    """Raw file bytes (reference image_utils.py:27)."""
    with open(filename, "rb") as f:
        return f.read()


def image_histogram(im):
    """(colors, counts) over an RGB image (reference image_utils.py:84-91)."""
    return np.unique(im.reshape(-1, im.shape[2]), axis=0, return_counts=True)
