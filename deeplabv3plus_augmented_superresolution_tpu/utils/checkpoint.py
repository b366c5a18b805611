"""Checkpoint/resume (aux subsystem, SURVEY.md §5.4).

The reference's only checkpointing is the Keras weight-file cache plus the
hdf5 staging layer. Here:

  * full TRAIN-STATE checkpoints (params + optimizer state + step) as a
    single .npz — `save_train_state` / `load_train_state`, used by
    cli/train.py's --ckpt_dir/--resume so an interrupted run continues with
    intact Adam moments and LR-schedule position. The file stays a valid
    params-only checkpoint for every CLI's --weights_path (the extra keys
    are `__`-prefixed and `load_params_npz` skips them).
  * orbax-backed pytree checkpoints (`save_checkpoint` / `restore_checkpoint`)
    — cli/train.py `--ckpt_format orbax` writes the FULL train state
    (params + optimizer state + step) as a checkpoint directory with each
    array's sharding preserved, so a --devices/--multihost run saves the
    distributed state shard-by-shard instead of gathering it to one host
    (the .npz path device_gets everything; tests/test_training.py pins the
    sharded round trip on the fake mesh).
"""

import os
from typing import Any, List, Optional, Tuple

import numpy as np

_OPT_PREFIX = "__opt__."
_STEP_KEY = "__step__.0"


def save_train_state(path: str, params: Any, opt_state: Any,
                     step: int) -> None:
    """Save (params, optimizer state, step) as one .npz.

    Params are stored under the standard flat `<layer>.<weight>` keys
    (models/weights.py:save_params_npz contract), optimizer-state leaves as
    `__opt__.<i>` in jax tree-flatten order, and the step counter as
    `__step__.0` — so the file doubles as a drop-in --weights_path
    checkpoint anywhere a params-only .npz is accepted.
    """
    import jax

    flat = {f"{l}.{w}": np.asarray(v)
            for l, ws in params.items() for w, v in ws.items()}
    for i, leaf in enumerate(jax.tree_util.tree_leaves(opt_state)):
        flat[f"{_OPT_PREFIX}{i}"] = np.asarray(leaf)
    flat[_STEP_KEY] = np.asarray(int(step))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_train_state(path: str) -> Tuple[Optional[List[np.ndarray]], int]:
    """Read the optimizer leaves + step from a train-state .npz.

    Returns (opt_leaves, step); (None, 0) for a params-only checkpoint
    (backward compatible — resume then reinitializes the optimizer).
    Params themselves load through the ordinary load_params_npz /
    build_model path, which also handles head renaming.
    """
    flat = np.load(path)
    if _STEP_KEY not in flat.files:
        return None, 0
    step = int(flat[_STEP_KEY])
    opt_keys = sorted((k for k in flat.files if k.startswith(_OPT_PREFIX)),
                      key=lambda k: int(k[len(_OPT_PREFIX):]))
    leaves = [flat[k] for k in opt_keys]
    return leaves, step


def restore_opt_state(opt_state_template: Any,
                      leaves: List[np.ndarray]) -> Any:
    """Fit saved optimizer leaves into a freshly tx.init()'d template.

    Raises ValueError on any structure/shape mismatch (e.g. the resumed run
    chose a different optimizer or schedule) — callers fall back to a fresh
    optimizer state and warn.
    """
    import jax
    import jax.numpy as jnp

    tmpl_leaves, treedef = jax.tree_util.tree_flatten(opt_state_template)
    if len(tmpl_leaves) != len(leaves):
        raise ValueError(
            f"optimizer state has {len(tmpl_leaves)} leaves but the "
            f"checkpoint stored {len(leaves)} — different optimizer/schedule")
    fitted = []
    for i, (t, s) in enumerate(zip(tmpl_leaves, leaves)):
        if tuple(np.shape(t)) != tuple(np.shape(s)):
            raise ValueError(
                f"optimizer leaf {i}: template shape {np.shape(t)} vs "
                f"checkpoint {np.shape(s)}")
        fitted.append(jnp.asarray(s, dtype=jnp.asarray(t).dtype))
    return jax.tree_util.tree_unflatten(treedef, fitted)


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
