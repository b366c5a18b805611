from .resize import resize, resize_matrix
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
    "affine_warp",
    "rotate",
    "translate",
    "rotation_transform",
    "translation_transform",
    "compose_transforms",
    "rotate_translate_fused",
]
