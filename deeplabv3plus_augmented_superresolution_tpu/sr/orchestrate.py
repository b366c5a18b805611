"""SR orchestration: solve + threshold + optional image export.

Mirrors reference superres_utils.py:213-273 (compute_SR): dispatch one of
aug/max/mean SR over a normalized LR mask stack, super-resolve the max stack
too in slice_max mode (class-vs-max thresholding), else threshold at
th_factor * max.
"""

import os
from typing import Optional

import jax
import numpy as np

from ..data.io import save_img
from .postprocess import threshold_image
from .solver import (
    SRConfig,
    augmented_superresolution,
    max_superresolution,
    mean_superresolution,
)

SR_TYPES = ("aug", "mean", "max")


def compute_sr(sr_cfg: SRConfig, class_masks, angles, shifts, filename: str,
               dest_folder: Optional[str] = None, sr_type: str = "aug",
               max_masks=None, save_intermediate_output: bool = False,
               save_final_output: bool = False, class_id: int = 8,
               th_factor: float = 0.15,
               dropout_key: Optional[jax.Array] = None,
               gram_coeffs=None) -> np.ndarray:
    """Returns the thresholded HR mask (H, W, 1) with values {0, class_id}.

    gram_coeffs: optional precomputed Gram stencil for THESE (angles, shifts,
    sr_cfg) (sr.precompute_gram_stencil) — skips the per-call probe
    extraction of the aug solve. Use when many images share one staged TTA
    set (generate_augmented_copies --shared_tta)."""
    if sr_type not in SR_TYPES:
        raise ValueError(f"SR_type must be one of {SR_TYPES}, got {sr_type!r}")

    if sr_type == "aug":
        def sr_function(masks):
            return augmented_superresolution(masks, angles, shifts, sr_cfg,
                                             dropout_key=dropout_key,
                                             gram_coeffs=gram_coeffs)
    elif sr_type == "mean":
        def sr_function(masks):
            return mean_superresolution(masks, angles, shifts, sr_cfg)
    else:
        def sr_function(masks):
            return max_superresolution(masks, angles, shifts, sr_cfg)

    target_image_class, _ = sr_function(class_masks)

    target_image_max = None
    if max_masks is not None and len(max_masks) == len(class_masks):
        target_image_max, _ = sr_function(max_masks)
        th_mask = threshold_image(target_image_class, class_id,
                                  th_mask=target_image_max)
    else:
        th_mask = threshold_image(target_image_class, class_id,
                                  th_factor=th_factor)
    th_mask = np.asarray(th_mask)

    if dest_folder is not None and (save_intermediate_output or save_final_output):
        out_folder = os.path.join(dest_folder, f"{sr_type}_SR")
        if save_intermediate_output:
            save_img(os.path.join(out_folder, f"{filename}_class.png"),
                     np.asarray(target_image_class), scale=True)
            if target_image_max is not None:
                save_img(os.path.join(out_folder, f"{filename}_max.png"),
                         np.asarray(target_image_max), scale=True)
        if save_final_output:
            save_img(os.path.join(out_folder, f"{filename}_{sr_type}_SR.png"),
                     th_mask, scale=True)

    return th_mask
