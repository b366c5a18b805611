"""Device-mesh construction for the ("data", "aug") sharding layout.

The reference runs on one pinned GPU (generate_augmented_copies.py:10); the
TPU-native scaling axes are the image batch ("data") and the TTA copies
("aug") — SURVEY.md §5.7/§5.8. Images shard over "data", each image's
augmented copies over "aug"; loss reductions over copies become psum-style
collectives that XLA inserts from the sharding annotations.
"""

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              shape: Optional[Tuple[int, int]] = None,
              axis_names: Tuple[str, str] = ("data", "aug")) -> Mesh:
    """Build a 2-D ("data", "aug") mesh over the given (or all) devices.

    Default factorization puts everything on "aug" when only one image is in
    flight; pass shape=(d, a) with d*a == len(devices) to rebalance.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (1, n)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def aug_sharding(mesh: Mesh) -> NamedSharding:
    """(B, N, ...) arrays: batch on data, copies on aug."""
    return NamedSharding(mesh, P("data", "aug"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
