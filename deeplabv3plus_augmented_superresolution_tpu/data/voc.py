"""PASCAL VOC 2012 acquisition and preparation (layer L0 of SURVEY.md §1).

Covers the reference's download_and_prepare_voc.py, data_scripts/data_utils.py,
remove_gt_colormap.py and generate_dataset_files.py: dataset download
(official/mirror/Berkeley SBD), idempotent extraction, colormap stripping and
the trainaug/valaug file-list union. TFRecord export is replaced by a plain
array-record export helper: the TPU pipeline consumes images directly (the
reference's TFRecord path was itself vestigial, SURVEY.md §2.2).
"""

import os
import sys
import tarfile
import zipfile
from typing import Optional, Sequence, Tuple

import numpy as np

VOC_URL = "http://host.robots.ox.ac.uk/pascal/VOC/voc2012/VOCtrainval_11-May-2012.tar"
VOC_MIRROR_URL = "http://pjreddie.com/media/files/VOCtrainval_11-May-2012.tar"
BERKELEY_URL = "https://www.dropbox.com/s/oeu149j8qtbs1x0/SegmentationClassAug.zip?dl=1"

# The 21 VOC classes; 255 is the ignore label (reference data/pascal_classes.txt).
PASCAL_CLASSES = [
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]


def voc_colormap(num_colors: int = 256) -> np.ndarray:
    """The VOC bit-twiddled palette (reference pascal_voc_dataset.py:51-76)."""
    cmap = np.zeros((num_colors, 3), dtype=np.uint8)
    for i in range(num_colors):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap


def download_dataset(dataset_url: str, dest_folder: str) -> str:
    """Idempotent download (reference data_utils.py:13-49)."""
    import urllib.request

    extension = ".zip" if ".zip" in dataset_url else ".tar"
    name = dataset_url.split("/")[-1]
    filename = name[: name.index(extension) + len(extension)]
    os.makedirs(dest_folder, exist_ok=True)
    full_dest_path = os.path.join(dest_folder, filename)
    if os.path.exists(full_dest_path):
        print(f"File {filename} already in destination folder, skipping download")
        return full_dest_path

    def _progress(count, block_size, total_size):
        sys.stdout.write("\rDownloading %s %.1f%%" % (
            filename, 100.0 * count * block_size / max(total_size, 1)))
        sys.stdout.flush()

    filepath, _ = urllib.request.urlretrieve(dataset_url, full_dest_path, _progress)
    print(f"\nSuccessfully downloaded {filename}")
    return filepath


def extract_file(filepath: str, dest_folder: str,
                 is_extracted: Optional[str] = None) -> None:
    """Idempotent zip/tar extraction (reference data_utils.py:52-83)."""
    if is_extracted and os.path.exists(is_extracted):
        print("File already extracted")
        return
    if filepath.endswith(".zip"):
        with zipfile.ZipFile(filepath, "r") as zf:
            zf.extractall(dest_folder)
    elif filepath.endswith(".tar"):
        with tarfile.open(filepath, "r") as tf:
            tf.extractall(dest_folder)
    else:
        raise ValueError("The specified file is not a zip or a tar file")


def remove_gt_colormap(seg_folder: str, output_dir: str) -> int:
    """Strip the VOC palette from GT PNGs to raw label PNGs
    (reference data_scripts/remove_gt_colormap.py:29-61)."""
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    count = 0
    for name in sorted(os.listdir(seg_folder)):
        if not name.endswith(".png"):
            continue
        img = Image.open(os.path.join(seg_folder, name))
        raw = np.asarray(img)  # palette PNG: values are already label indices
        Image.fromarray(raw.astype(np.uint8), mode="L").save(
            os.path.join(output_dir, name))
        count += 1
    return count


def generate_dataset_files(pascal_root: str, berkeley_lists_dir: str,
                           output_folder: str) -> Tuple[int, int]:
    """trainaug/valaug list union (reference generate_dataset_files.py:38-61):
    validation = pascal val; train = (pascal ∪ berkeley) − validation."""

    def read_list(path):
        with open(path) as f:
            return {line.rstrip() for line in f if line.strip()}

    seg_dir = os.path.join(pascal_root, "ImageSets", "Segmentation")
    pascal_train = read_list(os.path.join(seg_dir, "train.txt"))
    pascal_val = read_list(os.path.join(seg_dir, "val.txt"))
    berkeley_train = read_list(os.path.join(berkeley_lists_dir, "train.txt"))
    berkeley_val = read_list(os.path.join(berkeley_lists_dir, "val.txt"))

    everything = pascal_train | pascal_val | berkeley_train | berkeley_val
    validation = pascal_val
    train = everything - validation

    os.makedirs(output_folder, exist_ok=True)
    with open(os.path.join(output_folder, "trainaug.txt"), "w") as f:
        f.write("\n".join(sorted(train)))
    with open(os.path.join(output_folder, "valaug.txt"), "w") as f:
        f.write("\n".join(sorted(validation)))
    return len(train), len(validation)


def get_basenames(split: str, pascal_root: str) -> Sequence[str]:
    """Image ids of a segmentation split (reference pascal_voc_dataset.py:113)."""
    path = os.path.join(pascal_root, "ImageSets", "Segmentation", f"{split}.txt")
    with open(path) as f:
        return [line.rstrip() for line in f if line.strip()]


def export_arrayrecord(split: str, pascal_root: str, dest_dir: str,
                       image_size=(512, 512), limit: Optional[int] = None) -> str:
    """Pack a split's (image, mask) pairs into one .npz for fast host loading
    (replaces the reference's TFRecord export, pascal_voc_dataset.py:154-209)."""
    from .io import load_image

    basenames = get_basenames(split, pascal_root)
    if limit:
        basenames = basenames[:limit]
    images, masks = [], []
    for base in basenames:
        img = load_image(os.path.join(pascal_root, "JPEGImages", base + ".jpg"),
                         image_size=image_size, normalize=False)
        mask = load_image(os.path.join(pascal_root, "SegmentationClass", base + ".png"),
                          image_size=image_size, normalize=False, is_png=True,
                          resize_method="nearest")
        images.append(img.astype(np.uint8))
        masks.append(mask.astype(np.uint8))
    os.makedirs(dest_dir, exist_ok=True)
    out = os.path.join(dest_dir, f"segmentation_{split}.npz")
    np.savez_compressed(out, images=np.stack(images), masks=np.stack(masks),
                        basenames=np.asarray(basenames))
    return out
