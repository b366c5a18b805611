"""Checkpoint/resume (aux subsystem, SURVEY.md §5.4).

The reference's only checkpointing is the Keras weight-file cache plus the
hdf5 staging layer. Here: orbax-backed pytree checkpoints for model params
(and any solver state), with a plain-npz fallback (models/weights.py) so
checkpoints stay readable without orbax.
"""

import os
from typing import Any, Optional


def save_checkpoint(path: str, pytree: Any) -> str:
    """Save a pytree (e.g. model params) to an orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, pytree, force=True)
    checkpointer.wait_until_finished()
    return path


def restore_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree saved by save_checkpoint. template (matching pytree of
    arrays/ShapeDtypeStructs) restores with exact structure/dtypes."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    checkpointer = ocp.StandardCheckpointer()
    if template is not None:
        return checkpointer.restore(path, target=template)
    return checkpointer.restore(path)
