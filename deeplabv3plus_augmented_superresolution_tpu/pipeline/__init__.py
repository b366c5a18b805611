from .augment import (create_augmented_copies, make_augmented_copies,
                      sample_augmentations, warp_augment_batch)
from .feature_maps import augmented_feature_maps, compute_augmented_feature_maps
from .end_to_end import asr_step, asr_step_multiclass

__all__ = [
    "create_augmented_copies",
    "make_augmented_copies",
    "sample_augmentations",
    "warp_augment_batch",
    "augmented_feature_maps",
    "compute_augmented_feature_maps",
    "asr_step",
    "asr_step_multiclass",
]
