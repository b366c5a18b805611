from .resize import resize, resize_matrix
from .shear_warp import paeth_inverse_rotate_translate, paeth_rotate_translate
from .fused_operator import fused_warp_downsample
from .opm import (create_mask, extract_masks, extract_masks_multiclass,
                  get_prediction,
                  min_max_normalization, prepare_sr_inputs)
from .gradients import bilateral_tv, image_gradients, total_variation
from .warp import (
    affine_warp,
    rotate,
    translate,
    rotation_transform,
    translation_transform,
    compose_transforms,
    rotate_translate_fused,
)

__all__ = [
    "resize",
    "resize_matrix",
    "paeth_rotate_translate",
    "paeth_inverse_rotate_translate",
    "fused_warp_downsample",
    "create_mask",
    "get_prediction",
    "extract_masks",
    "extract_masks_multiclass",
    "min_max_normalization",
    "prepare_sr_inputs",
    "bilateral_tv",
    "image_gradients",
    "total_variation",
    "affine_warp",
    "rotate",
    "translate",
    "rotation_transform",
    "translation_transform",
    "compose_transforms",
    "rotate_translate_fused",
]
