"""PascalVOC2012 dataset class + host loader with prefetch.

Counterpart of the reference's data_scripts/pascal_voc_dataset.py (basenames,
record export, tf.data pipeline with random_transform — reference
pascal_voc_dataset.py:113-340). TPU-native version: packed .npz array records
(data/voc.py) + a threaded host prefetcher that applies host_augment
transforms and yields numpy batches ready for device_put. Host I/O overlaps
device compute (SURVEY.md §7 "Host I/O overlap").
"""

import os
import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from . import voc
from .io import load_image


class PascalVOC2012Dataset:
    """Segmentation-split access over a prepared VOC tree."""

    CLASS_LABELS = voc.PASCAL_CLASSES
    IGNORE_LABEL = 255

    def __init__(self, pascal_root: str, image_size=(512, 512),
                 augmentation_params: Optional[dict] = None):
        self.pascal_root = pascal_root
        self.image_size = tuple(image_size)
        self.augmentation_params = augmentation_params

    def get_basenames(self, split: str):
        """(reference pascal_voc_dataset.py:113)"""
        return voc.get_basenames(split, self.pascal_root)

    def export_arrayrecord(self, split: str, dest_dir: str,
                           limit: Optional[int] = None) -> str:
        """(replaces export_tfrecord, reference pascal_voc_dataset.py:154-209)"""
        return voc.export_arrayrecord(split, self.pascal_root, dest_dir,
                                      image_size=self.image_size, limit=limit)

    def load_pair(self, basename: str) -> Tuple[np.ndarray, np.ndarray]:
        img = load_image(os.path.join(self.pascal_root, "JPEGImages",
                                      basename + ".jpg"),
                         image_size=self.image_size, normalize=True)
        mask_dir = "SegmentationClassAug" if os.path.isdir(
            os.path.join(self.pascal_root, "SegmentationClassAug")) \
            else "SegmentationClass"
        mask = load_image(os.path.join(self.pascal_root, mask_dir,
                                       basename + ".png"),
                          image_size=self.image_size, normalize=False,
                          is_png=True, resize_method="nearest")
        return img, mask

    def batches(self, split: str, batch_size: int, shuffle: bool = False,
                seed: int = 0, augment: bool = False,
                prefetch: int = 2) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Threaded prefetching batch iterator (the reference's tf.data
        pipeline role, reference pascal_voc_dataset.py:248-282)."""
        names = list(self.get_basenames(split))
        if shuffle:
            rng = np.random.default_rng(seed)
            rng.shuffle(names)

        def producer(out_q: queue.Queue):
            try:
                for start in range(0, len(names) - batch_size + 1, batch_size):
                    imgs, masks = [], []
                    for i, base in enumerate(names[start:start + batch_size]):
                        img, mask = self.load_pair(base)
                        if augment:
                            from .host_augment import random_transform
                            params = self.augmentation_params or {
                                "flip_lr": True,
                                "rotation_range": (-10.0, 10.0),
                                "zoom_range": (0.8, 1.2),
                                "brightness_range": (-20, 20),
                            }
                            img8 = (img * 255).astype(np.uint8)
                            img8, mask = random_transform(
                                img8, mask[..., 0].astype(np.uint8),
                                target_shape=self.image_size,
                                seed=seed + start + i, **params)
                            img = img8.astype(np.float32) / 255.0
                            mask = mask[..., None].astype(np.float32)
                        imgs.append(img)
                        masks.append(mask)
                    out_q.put((np.stack(imgs), np.stack(masks)))
            finally:
                out_q.put(None)

        q: queue.Queue = queue.Queue(maxsize=prefetch)
        thread = threading.Thread(target=producer, args=(q,), daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item
