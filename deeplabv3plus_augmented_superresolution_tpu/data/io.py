"""Image and hdf5 I/O.

load_image mirrors reference utils.py:94-112 (decode jpg as 3-channel / png
as 1-channel, optional bilinear/nearest resize, float32, optional /255) using
PIL for decode and our TF-semantics resize. save_img mirrors
tf.keras.utils.save_img's scale behavior used for mask export
(reference superres_utils.py:262-271, generate_standard_output.py).

The hdf5 staging format is kept byte-compatible with the reference
(augmentation_utils.py:117-136): datasets class_masks / [max_masks] / angles /
shifts plus attrs filename / mode / angle_max / shift_max — so precomputed
files from either implementation are interchangeable.
"""

import os
from typing import Optional, Tuple

import numpy as np
from PIL import Image

from ..ops.resize import resize


def load_image(img_path: str, image_size: Optional[Tuple[int, int]] = None,
               normalize: bool = True, is_png: bool = False,
               resize_method: str = "bilinear") -> np.ndarray:
    img = Image.open(img_path)
    if not is_png:
        img = img.convert("RGB")
        arr = np.asarray(img, dtype=np.float32)
    else:
        # single-channel label PNGs (VOC GT); match tf.io.decode_png(channels=1)
        if img.mode not in ("L", "P", "I", "I;16"):
            img = img.convert("L")
        arr = np.asarray(img, dtype=np.float32)[..., None] \
            if np.asarray(img).ndim == 2 else np.asarray(img, dtype=np.float32)[..., :1]

    if image_size is not None and tuple(arr.shape[:2]) != tuple(image_size):
        arr = np.asarray(resize(arr, image_size, method=resize_method),
                         dtype=np.float32)
    arr = arr.astype(np.float32)
    if normalize:
        arr = arr / 255.0
    return arr


def save_img(path: str, x, scale: bool = True,
             compress_level: int = 6) -> None:
    """tf.keras.utils.save_img-compatible PNG writer.

    compress_level: zlib level (PIL default 6). Label masks are almost-
    constant images; level 1 encodes ~3x faster for ~2x the (tiny) file —
    the serving path's writer pool uses it.
    """
    x = np.asarray(x, dtype=np.float32)
    if x.ndim == 2:
        x = x[..., None]
    if scale:
        x = x - x.min()
        mx = x.max()
        if mx > 0:
            x = x / mx
        x = x * 255.0
    x = np.clip(x, 0, 255).astype(np.uint8)
    if x.shape[-1] == 1:
        img = Image.fromarray(x[..., 0], mode="L")
    else:
        img = Image.fromarray(x)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    img.save(path, compress_level=compress_level)


# ---------------------------------------------------------------------------
# hdf5 staging (reference-compatible layout)
# ---------------------------------------------------------------------------

def write_augmented_hdf5(dest_folder: str, image_name: str, class_masks,
                         angles, shifts, mode: str, angle_max: float,
                         shift_max: float, max_masks=None) -> str:
    import h5py

    os.makedirs(dest_folder, exist_ok=True)
    path = os.path.join(dest_folder, f"{image_name}.hdf5")
    with h5py.File(path, "w") as f:
        f.create_dataset("class_masks", data=np.asarray(class_masks))
        if mode == "slice_max" and max_masks is not None:
            f.create_dataset("max_masks", data=np.asarray(max_masks))
        f.create_dataset("angles", data=np.asarray(angles))
        f.create_dataset("shifts", data=np.asarray(shifts))
        f.attrs["filename"] = image_name
        f.attrs["mode"] = mode
        f.attrs["angle_max"] = angle_max
        f.attrs["shift_max"] = shift_max
    return path


def check_hdf5_validity(file, num_aug: int = 100) -> bool:
    """Every dataset must have first-dim >= num_aug (reference
    superres_utils.py:108-115)."""
    for key in file:
        if file[key].shape[0] < num_aug:
            return False
    return True


def load_sr_data(filepath: str, num_aug: int = 100, global_normalize: bool = True):
    """Load + normalize a staged hdf5 (reference superres_utils.py:154-210).

    Returns (class_masks, max_masks|None, angles, shifts, filename) with the
    mode-dependent [0,1] normalization applied.
    """
    import h5py

    from ..ops.opm import prepare_sr_inputs

    with h5py.File(filepath, "r") as f:
        if not check_hdf5_validity(f, num_aug=num_aug):
            raise ValueError(f"File: {filepath} is invalid")
        filename = f.attrs["filename"]
        mode = f.attrs["mode"]
        angles = f["angles"][:num_aug].astype(np.float32)
        shifts = f["shifts"][:num_aug].astype(np.float32)
        class_masks = f["class_masks"][:num_aug].astype(np.float32)
        max_masks = f["max_masks"][:num_aug].astype(np.float32) \
            if (mode == "slice_max" and "max_masks" in f) else None

    class_masks, max_masks = prepare_sr_inputs(
        class_masks, max_masks, mode=str(mode), global_normalize=global_normalize)
    return class_masks, max_masks, angles, shifts, str(filename)
