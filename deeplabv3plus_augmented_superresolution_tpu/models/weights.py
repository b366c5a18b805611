"""Keras .h5 checkpoint loader for the bonlime DeepLabV3+ weights.

The reference downloads pretrained 'pascal_voc' weights and loads them
by layer name with skip_mismatch (reference model.py:9-10, 129-145). This
loader maps the same .h5 layout onto our flat param dict (which is keyed by
those exact Keras layer names — see models/layers.py docstring).

No network access is assumed: pass a local path. ``default_weights_path``
gives the conventional cache location (data/model_weights/<file>.h5);
download it out-of-band on a machine with egress.
"""

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .layers import Params

WEIGHTS_FILENAMES = {
    "xception": "deeplabv3_xception_tf_dim_ordering_tf_kernels.h5",
    "mobilenet": "deeplabv3_mobilenetv2_tf_dim_ordering_tf_kernels.h5",
}

# Upstream release URLs, for provenance / out-of-band download only
# (reference model.py:9-10).
WEIGHTS_URLS = {
    "xception": "https://github.com/bonlime/keras-deeplab-v3-plus/releases/download/1.1/deeplabv3_xception_tf_dim_ordering_tf_kernels.h5",
    "mobilenet": "https://github.com/bonlime/keras-deeplab-v3-plus/releases/download/1.1/deeplabv3_mobilenetv2_tf_dim_ordering_tf_kernels.h5",
}

_SUFFIX_TO_NAME = {
    "kernel": "kernel",
    "bias": "bias",
    "depthwise_kernel": "depthwise_kernel",
    "gamma": "gamma",
    "beta": "beta",
    "moving_mean": "moving_mean",
    "moving_variance": "moving_variance",
}


def default_weights_path(backbone: str, data_dir: Optional[str] = None) -> str:
    data_dir = data_dir or os.path.join(os.getcwd(), "data")
    return os.path.join(data_dir, "model_weights", WEIGHTS_FILENAMES[backbone])


def _iter_h5_layers(f):
    """Yield (layer_name, {weight_name: np.ndarray}) for Keras h5 weight files,
    handling both weights-only files and full-model saves."""
    root = f["model_weights"] if "model_weights" in f else f
    layer_names = [n.decode() if isinstance(n, bytes) else n
                   for n in root.attrs.get("layer_names", list(root.keys()))]
    for lname in layer_names:
        if lname not in root:
            continue
        group = root[lname]
        weight_names = [n.decode() if isinstance(n, bytes) else n
                        for n in group.attrs.get("weight_names", [])]
        weights = {}
        for wname in weight_names:
            arr = np.asarray(group[wname])
            suffix = wname.split("/")[-1].split(":")[0]
            weights[suffix] = arr
        if weights:
            yield lname, weights


def load_keras_h5_weights(params: Params, weights_path: str,
                          strict: bool = False) -> Params:
    """Load by name with skip_mismatch semantics (reference model.py:145).

    Layers present in the file but absent from ``params`` are ignored; shape
    mismatches keep the existing (random) value unless strict=True. Keras
    depthwise kernels (k, k, C, 1) are transposed to our grouped-HWIO
    (k, k, 1, C) layout.
    """
    import h5py

    new_params: Params = {k: dict(v) for k, v in params.items()}
    loaded, skipped = 0, []
    with h5py.File(weights_path, "r") as f:
        for lname, weights in _iter_h5_layers(f):
            if lname not in new_params:
                continue
            for suffix, arr in weights.items():
                key = _SUFFIX_TO_NAME.get(suffix)
                if key is None:
                    continue
                if key == "depthwise_kernel":
                    arr = np.transpose(arr, (0, 1, 3, 2))
                if key not in new_params[lname]:
                    skipped.append((lname, key, "absent"))
                    continue
                want = new_params[lname][key].shape
                if tuple(arr.shape) != tuple(want):
                    if strict:
                        raise ValueError(
                            f"Shape mismatch for {lname}/{key}: file {arr.shape} vs model {want}")
                    skipped.append((lname, key, f"shape {arr.shape} vs {want}"))
                    continue
                new_params[lname][key] = jnp.asarray(arr, jnp.float32)
                loaded += 1
    if loaded == 0:
        raise ValueError(f"No weights matched between {weights_path} and the model")
    return new_params


def save_params_npz(params: Params, path: str) -> None:
    """Flat .npz export (layer.weight -> array) for orbax-free checkpointing."""
    flat = {f"{l}.{w}": np.asarray(v) for l, ws in params.items() for w, v in ws.items()}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_params_npz(path: str) -> Params:
    flat = np.load(path)
    params: Params = {}
    for key in flat.files:
        if key.startswith("__"):
            continue  # train-state extras (utils/checkpoint.py) — not params
        layer, weight = key.rsplit(".", 1)
        params.setdefault(layer, {})[weight] = jnp.asarray(flat[key])
    return params
