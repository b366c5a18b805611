from .profiling import StageTimer, trace_to, device_summary
from .checkpoint import (save_checkpoint, restore_checkpoint,
                         save_train_state, load_train_state,
                         restore_opt_state)
from .retry import device_healthy, device_resilient, wait_for_device
from .roofline import parse_hlo_flop_classes, sol_summary
from .viz import plot_prediction, plot_images, plot_image, plot_histogram, print_labels

__all__ = [
    "StageTimer",
    "trace_to",
    "device_summary",
    "save_checkpoint",
    "restore_checkpoint",
    "save_train_state",
    "load_train_state",
    "restore_opt_state",
    "plot_prediction",
    "plot_images",
    "plot_image",
    "plot_histogram",
    "print_labels",
    "device_healthy",
    "device_resilient",
    "wait_for_device",
    "parse_hlo_flop_classes",
    "sol_summary",
]
