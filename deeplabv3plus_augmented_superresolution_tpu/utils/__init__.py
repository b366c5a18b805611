from .profiling import StageTimer, trace_to, device_summary
from .checkpoint import save_checkpoint, restore_checkpoint

__all__ = [
    "StageTimer",
    "trace_to",
    "device_summary",
    "save_checkpoint",
    "restore_checkpoint",
]
