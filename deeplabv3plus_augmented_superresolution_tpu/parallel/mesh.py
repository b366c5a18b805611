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


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Multi-host bring-up (SURVEY.md §5.8): jax.distributed.initialize with
    the standard coordinator env fallbacks. Returns True when a multi-process
    runtime was initialized, False for ordinary single-process runs (no-op).

    On TPU pods the args are usually auto-detected and everything can be
    None; on CPU/GPU pass (or export) JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES and JAX_PROCESS_ID.
    """
    import os

    env = os.environ
    addr = coordinator_address or env.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else (
        int(env["JAX_NUM_PROCESSES"]) if "JAX_NUM_PROCESSES" in env else None)
    pid = process_id if process_id is not None else (
        int(env["JAX_PROCESS_ID"]) if "JAX_PROCESS_ID" in env else None)
    if addr is None and nproc is None:
        return False
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=nproc, process_id=pid)
    return True


def multihost_mesh_shape(num_processes: int, local_devices: int,
                         axis_names: Tuple[str, str] = ("data", "aug")
                         ) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """(dcn_shape, ici_shape) factorization for a hybrid mesh.

    The image-batch ("data") axis spans hosts over DCN — each image's ASR
    program is independent, so no collective ever crosses the slow
    inter-host network — while the copies ("aug") axis stays inside each
    host's ICI domain, where the df-term psum over copies is cheap.
    """
    del axis_names
    return (num_processes, 1), (1, local_devices)


def make_multihost_mesh(axis_names: Tuple[str, str] = ("data", "aug")) -> Mesh:
    """DCN x ICI hybrid mesh over all processes' devices.

    Single-process fallback: the ordinary make_mesh over local devices with
    everything on "aug" (serving layout), so code written against this
    constructor runs unchanged from a laptop to a multi-host pod.
    """
    if jax.process_count() == 1:
        return make_mesh(axis_names=axis_names)
    from jax.experimental import mesh_utils

    dcn, ici = multihost_mesh_shape(jax.process_count(),
                                    jax.local_device_count())
    try:
        # TPU pods: group by slice so the "aug" axis rides ICI.
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=ici, dcn_mesh_shape=dcn, devices=jax.devices())
    except ValueError:
        # Platforms without slice topology (multi-process CPU/GPU): group
        # rows by owning process, which is the same data-outside/aug-inside
        # layout.
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        devices = np.asarray(devs).reshape(jax.process_count(),
                                           jax.local_device_count())
    return Mesh(devices, axis_names)


def host_local_batch_to_global(mesh: Mesh, array, spec: P):
    """Assemble per-host shards into one global jax.Array (the multi-host
    input path: every process loads only its own images)."""
    from jax import make_array_from_process_local_data

    return make_array_from_process_local_data(NamedSharding(mesh, spec), array)


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def aug_sharding(mesh: Mesh) -> NamedSharding:
    """(B, N, ...) arrays: batch on data, copies on aug."""
    return NamedSharding(mesh, P("data", "aug"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
