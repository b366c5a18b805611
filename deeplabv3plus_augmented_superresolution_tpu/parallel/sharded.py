"""Sharded batch ASR: the multi-chip pipeline.

Batches images over the "data" mesh axis and each image's augmented copies
over "aug". One jitted program covers copies -> forward -> OPM -> SR solve ->
threshold for the whole batch; XLA inserts the ICI collectives implied by the
sharding annotations (the data-fidelity sum over copies inside the solver's
grad becomes a psum over "aug").

The reference has no distributed path at all (SURVEY.md §2 row
"Parallelism"); this module is the new-by-design scaling component.
"""

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.deeplab import DeepLabConfig
from ..pipeline.end_to_end import asr_step, asr_step_multiclass
from ..sr.solver import SRConfig


def padded_aug_count(num_aug: int, mesh: Mesh) -> int:
    """Smallest multiple of the "aug" axis size >= num_aug. GSPMD requires
    the sharded dimension divisible by the axis size, so non-divisible copy
    counts (e.g. the production 100 copies on 8 shards) run padded; the
    padded copies are identity transforms that every data term zero-weights
    (SRConfig.num_valid)."""
    aug = mesh.shape["aug"]
    return -(-num_aug // aug) * aug


def padded_sr_cfg(sr_cfg: SRConfig, mesh: Mesh) -> SRConfig:
    """Public alias of the aug-padding rule: the SRConfig the batched program
    actually runs (use it to precompute a matching Gram stencil)."""
    return _padded_cfg(sr_cfg, mesh)


def _padded_cfg(sr_cfg: SRConfig, mesh: Mesh) -> SRConfig:
    padded = padded_aug_count(sr_cfg.num_aug, mesh)
    if padded == sr_cfg.num_aug:
        return sr_cfg
    if sr_cfg.num_valid:
        raise ValueError("sr_cfg.num_valid is managed by the parallel layer; "
                         "pass the real copy count as num_aug")
    return dataclasses.replace(sr_cfg, num_aug=padded,
                               num_valid=sr_cfg.num_aug)


def make_asr_batch_fn(mesh: Mesh, model_cfg: DeepLabConfig, sr_cfg: SRConfig,
                      class_id, mode: str = "argmax",
                      th_factor: float = 0.15,
                      sr_types: Tuple[str, ...] = ("aug", "max", "mean"),
                      chunk_size: int = 0, class_chunk: int = 0,
                      gram_coeffs=None,
                      return_targets: bool = False,
                      return_label_map: bool = False,
                      pack_uint8: bool = False):
    """Returns a jitted fn(params, images, angles, shifts) -> dict of masks.

    images: (B, H, W, 3) sharded on "data";
    angles: (B, N), shifts: (B, N, 2) sharded on ("data", "aug");
    outputs: (B, H, W, 1) per SR type, sharded on "data".

    N here is the PADDED copy count (shard_batch pads the host arrays when
    sr_cfg.num_aug does not divide the aug axis).

    gram_coeffs: optional precomputed Gram stencil for a fixed TTA set
    (sr.precompute_gram_stencil, computed with the PADDED cfg — see
    padded_sr_cfg); replicated across the mesh and shared by every image in
    the batch.

    class_id: an int for the reference's single-class semantics, or a tuple
    of ints for the multi-class program (asr_step_multiclass) — outputs then
    carry a class axis after the batch axis: (B, K, H, W, 1).
    """
    sr_cfg = _padded_cfg(sr_cfg, mesh)
    if gram_coeffs is not None:
        gram_coeffs = jax.device_put(gram_coeffs,
                                     NamedSharding(mesh, P()))
    multiclass = isinstance(class_id, tuple) and len(class_id) > 1
    one_class = class_id[0] if (isinstance(class_id, tuple)
                                and not multiclass) else class_id

    def batch_fn(params, images, angles, shifts):
        def per_image(image, a, s):
            if multiclass:
                return asr_step_multiclass(
                    params, image, a, s, model_cfg, sr_cfg, tuple(class_id),
                    mode, th_factor, True, sr_types, chunk_size, class_chunk,
                    gram_coeffs=gram_coeffs, return_targets=return_targets,
                    return_label_map=return_label_map)
            return asr_step(params, image, a, s, model_cfg, sr_cfg, one_class,
                            mode, th_factor, True, sr_types, chunk_size,
                            gram_coeffs=gram_coeffs,
                            return_targets=return_targets)

        out = jax.vmap(per_image)(images, angles, shifts)
        if pack_uint8:
            # Mask outputs hold {0, class_id}: a device-side uint8 cast is
            # lossless and quarters the device->host transfer the serving
            # path's writer pool pays per batch (continuous _target outputs
            # stay float).
            out = {k: (v if k.endswith("_target") else v.astype(jnp.uint8))
                   for k, v in out.items()}
        return out

    in_shardings = (
        NamedSharding(mesh, P()),                     # params replicated
        NamedSharding(mesh, P("data")),               # images
        NamedSharding(mesh, P("data", "aug")),        # angles
        NamedSharding(mesh, P("data", "aug")),        # shifts
    )
    out_shardings = NamedSharding(mesh, P("data"))
    return jax.jit(batch_fn, in_shardings=in_shardings,
                   out_shardings=out_shardings)


def make_sharded_train_step(mesh: Mesh, model_cfg: DeepLabConfig, tx,
                            bn_momentum: float = 0.9,
                            remat: bool = False,
                            skip_nonfinite: bool = False):
    """Data-parallel train step over the whole mesh (models/train.py jitted
    with mesh shardings).

    Training has no copy dimension, so BOTH mesh axes act as data axes: the
    global batch shards across every device (batch size must divide the
    device count evenly — see shard_train_batch), params and optimizer state
    stay replicated. No hand-written collectives: the loss mean runs over
    the globally sharded batch under GSPMD, so XLA inserts the gradient
    all-reduce, and BatchNorm's batch statistics (mean/var over (N, H, W) of
    the sharded batch, models/layers.py batch mode) become *synchronized*
    BatchNorm for free — per-device stats would silently diverge at small
    per-device batches.

    Returns jitted step(params, opt_state, images, labels) ->
    (params, opt_state, loss); params/opt_state donated.
    """
    from ..models.train import build_train_step

    repl = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    return jax.jit(build_train_step(model_cfg, tx, bn_momentum, remat=remat,
                                    skip_nonfinite=skip_nonfinite),
                   in_shardings=(repl, repl, batch, batch),
                   out_shardings=(repl, repl, repl),
                   donate_argnums=(0, 1))


def shard_train_batch(mesh: Mesh, images, labels):
    """Device-put a (B, H, W, 3)/(B, H, W) training batch sharded over all
    mesh devices. B must be a multiple of the device count (raise early with
    a clear message instead of GSPMD's shape error)."""
    n = mesh.size
    if images.shape[0] % n:
        raise ValueError(f"global batch {images.shape[0]} not divisible by "
                         f"the {n}-device mesh")
    sh = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    return jax.device_put(images, sh), jax.device_put(labels, sh)


def shard_batch_multihost(mesh: Mesh, params, images, angles, shifts):
    """Per-PROCESS local batch slices -> global sharded arrays.

    The multi-host input path (SURVEY.md §5.8): every process loads only its
    own images; the global ("data"-sharded) arrays are assembled from the
    host-local shards without any cross-host data movement (the "data" axis
    lives on the DCN dimension of make_multihost_mesh). params must be
    identical on every process (replicated assembly).
    """
    import numpy as np

    from .mesh import host_local_batch_to_global

    padded = padded_aug_count(angles.shape[1], mesh)
    if padded != angles.shape[1]:
        extra = padded - angles.shape[1]
        angles = jnp.pad(angles, ((0, 0), (0, extra)))
        shifts = jnp.pad(shifts, ((0, 0), (0, extra), (0, 0)))
    to_global = lambda x, spec: host_local_batch_to_global(
        mesh, np.asarray(x), spec)
    params = jax.tree.map(lambda x: to_global(x, P()), params)
    images = to_global(images, P("data"))
    angles = to_global(angles, P("data", "aug"))
    shifts = to_global(shifts, P("data", "aug"))
    return params, images, angles, shifts


def shard_batch(mesh: Mesh, params, images, angles, shifts):
    """Device-put a host batch with the canonical shardings.

    Pads the copy axis of angles/shifts with identity transforms up to a
    multiple of the "aug" axis size (matching make_asr_batch_fn's padded
    SRConfig) when needed.
    """
    padded = padded_aug_count(angles.shape[1], mesh)
    if padded != angles.shape[1]:
        extra = padded - angles.shape[1]
        angles = jnp.pad(angles, ((0, 0), (0, extra)))
        shifts = jnp.pad(shifts, ((0, 0), (0, extra), (0, 0)))
    params = jax.device_put(params, NamedSharding(mesh, P()))
    images = jax.device_put(images, NamedSharding(mesh, P("data")))
    angles = jax.device_put(angles, NamedSharding(mesh, P("data", "aug")))
    shifts = jax.device_put(shifts, NamedSharding(mesh, P("data", "aug")))
    return params, images, angles, shifts
