from .optimizer import OptimizerConfig, make_optimizer, make_schedule
from .solver import (
    SRConfig,
    SR_FUNCTIONS,
    augmented_superresolution,
    precompute_gram_stencil,
    forward_operator,
    max_superresolution,
    max_mean_superresolution,
    mean_superresolution,
    sr_loss,
)
from .postprocess import (combine_label_map, normalize_coefficients,
                          threshold_image)
from .stencil_cache import load_stencil, save_stencil, stencil_cache_key

__all__ = [
    "OptimizerConfig",
    "make_optimizer",
    "make_schedule",
    "SRConfig",
    "SR_FUNCTIONS",
    "augmented_superresolution",
    "precompute_gram_stencil",
    "forward_operator",
    "max_superresolution",
    "max_mean_superresolution",
    "mean_superresolution",
    "sr_loss",
    "normalize_coefficients",
    "threshold_image",
    "combine_label_map",
    "load_stencil",
    "save_stencil",
    "stencil_cache_key",
]
