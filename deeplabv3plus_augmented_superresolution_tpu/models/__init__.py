from .deeplab import DeepLabConfig, build_model, forward, init_params, head_layer_name
from .train import (
    build_train_step,
    forward_train,
    make_train_step,
    segmentation_loss,
    update_bn_stats,
)
from .weights import (
    default_weights_path,
    load_keras_h5_weights,
    load_params_npz,
    save_params_npz,
    WEIGHTS_URLS,
)

__all__ = [
    "DeepLabConfig",
    "build_model",
    "forward",
    "forward_train",
    "init_params",
    "head_layer_name",
    "build_train_step",
    "make_train_step",
    "segmentation_loss",
    "update_bn_stats",
    "default_weights_path",
    "load_keras_h5_weights",
    "load_params_npz",
    "save_params_npz",
    "WEIGHTS_URLS",
]
