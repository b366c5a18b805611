"""The flagship fused ASR program: one jitted step per image.

Composes what the reference runs as three staged scripts
(generate_augmented_copies -> hdf5 -> SR_single_class, plus
generate_standard_output) into a single on-device XLA program:

  image -> N augmented copies -> DeepLabV3+ forward -> OPM masks
        -> normalize -> {aug | max | mean} SR solve -> threshold
plus the "standard" baseline mask (the plain model's upsampled argmax,
reference generate_standard_output.py:15-98) from the same forward pass of
the identity copy — the reference recomputes it with a second model build.
"""

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.deeplab import DeepLabConfig, forward
from ..ops.opm import extract_masks, extract_masks_multiclass, prepare_sr_inputs
from ..ops.resize import resize
from ..sr.postprocess import combine_label_map, threshold_image
from ..sr.solver import (
    SRConfig,
    augmented_superresolution,
    max_mean_superresolution,
    max_superresolution,
    mean_superresolution,
    multiclass_max_mean_superresolution,
)
from .augment import make_augmented_copies

_SR_FNS = {
    "aug": augmented_superresolution,
    "max": max_superresolution,
    "mean": mean_superresolution,
}


@partial(jax.jit, static_argnames=("model_cfg", "sr_cfg", "class_id", "mode",
                                   "th_factor", "global_normalize", "sr_types",
                                   "chunk_size", "return_targets"))
def asr_step(params, image: jnp.ndarray, angles: jnp.ndarray,
             shifts: jnp.ndarray, model_cfg: DeepLabConfig, sr_cfg: SRConfig,
             class_id: int, mode: str = "argmax", th_factor: float = 0.15,
             global_normalize: bool = True,
             sr_types: Tuple[str, ...] = ("aug", "max", "mean"),
             chunk_size: int = 0,
             dropout_key: Optional[jax.Array] = None,
             gram_coeffs: Optional[jnp.ndarray] = None,
             return_targets: bool = False) -> Dict[str, jnp.ndarray]:
    """Full ASR for one image. Returns thresholded HR masks per SR type plus
    the 'standard' baseline mask, all (H, W, 1) float32 with values
    {0, class_id}.

    gram_coeffs: optional precomputed Gram stencil (sr.precompute_gram_stencil)
    for serving with a fixed augmentation set — hoists the probe extraction
    out of the per-image program.

    return_targets: also return the pre-threshold continuous SR targets under
    '<type>_target' keys — numeric regression tests compare these (a mask-only
    comparison can hide real numeric drift behind threshold margins)."""
    num_aug = sr_cfg.num_aug
    # Warp the copies in the model's compute dtype: the forward casts its
    # input to bf16 at entry anyway, so a bf16 warp loses nothing downstream
    # and halves the warp's HBM traffic (the kernel blends in f32 internally).
    if model_cfg.compute_dtype == "bfloat16":
        image = image.astype(jnp.bfloat16)
    copies = make_augmented_copies(image, angles, shifts, num_aug,
                                   warp_impl=sr_cfg.warp_impl,
                                   angle_max=sr_cfg.angle_max)

    if chunk_size and num_aug > chunk_size and num_aug % chunk_size == 0:
        chunks = copies.reshape((num_aug // chunk_size, chunk_size) + copies.shape[1:])
        preds = jax.lax.map(lambda c: forward(params, c, model_cfg), chunks)
        preds = preds.reshape((num_aug,) + preds.shape[2:])
    else:
        preds = forward(params, copies, model_cfg)

    class_masks, max_masks = extract_masks(preds, class_id, mode)
    class_masks, max_masks = prepare_sr_inputs(class_masks, max_masks, mode,
                                               global_normalize)

    # max and mean SR share one inverse-warp stack when both are requested.
    targets: Dict[str, Tuple[jnp.ndarray, Optional[jnp.ndarray]]] = {}
    if "max" in sr_types and "mean" in sr_types:
        mx, mean = max_mean_superresolution(class_masks, angles, shifts, sr_cfg)
        targets["max"], targets["mean"] = (mx, None), (mean, None)
        if mode == "slice_max" and max_masks is not None:
            mx_m, mean_m = max_mean_superresolution(max_masks, angles, shifts,
                                                    sr_cfg)
            targets["max"], targets["mean"] = (mx, mx_m), (mean, mean_m)

    results: Dict[str, jnp.ndarray] = {}
    for sr_type in sr_types:
        if sr_type in targets:
            target_class, target_max = targets[sr_type]
        else:
            fn = _SR_FNS[sr_type]
            kwargs = ({"dropout_key": dropout_key, "gram_coeffs": gram_coeffs}
                      if sr_type == "aug" else {})
            target_class, _ = fn(class_masks, angles, shifts, sr_cfg, **kwargs)
            target_max = None
            if mode == "slice_max" and max_masks is not None:
                target_max, _ = fn(max_masks, angles, shifts, sr_cfg, **kwargs)
        if target_max is not None:
            th = threshold_image(target_class, class_id, th_mask=target_max)
        else:
            th = threshold_image(target_class, class_id, th_factor=th_factor)
        results[sr_type] = th.astype(jnp.float32)
        if return_targets:
            results[sr_type + "_target"] = target_class.astype(jnp.float32)

    # Standard baseline from the identity copy's logits (copy 0).
    hr_logits = resize(preds[0], model_cfg.input_shape[:2], method="bilinear")
    standard = jnp.argmax(hr_logits, axis=-1)[..., None]
    results["standard"] = jnp.where(standard == class_id, standard, 0).astype(jnp.float32)
    return results


def _map_class_chunks(fn, arrays, n_classes: int, chunk: int):
    """Run `fn` over `chunk`-class groups sequentially (lax.map) instead of
    all K classes at once, bounding the per-class solve/warp memory peak to
    chunk/K of the full program. `arrays` lead with the class axis; `fn` gets
    the chunk-sliced tuple and returns a pytree with a leading class axis.
    Ragged K pads by repeating the last class, sliced off after (identical
    results, tests/test_multiclass.py)."""
    pad = (-n_classes) % chunk

    def prep(a):
        if pad:
            a = jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)], axis=0)
        return a.reshape((a.shape[0] // chunk, chunk) + a.shape[1:])

    out = jax.lax.map(fn, tuple(prep(a) for a in arrays))
    return jax.tree_util.tree_map(
        lambda o: o.reshape((-1,) + o.shape[2:])[:n_classes], out)


@partial(jax.jit, static_argnames=("model_cfg", "sr_cfg", "class_ids", "mode",
                                   "th_factor", "global_normalize", "sr_types",
                                   "chunk_size", "class_chunk",
                                   "return_targets", "return_label_map",
                                   "label_map_rule"))
def asr_step_multiclass(params, image: jnp.ndarray, angles: jnp.ndarray,
                        shifts: jnp.ndarray, model_cfg: DeepLabConfig,
                        sr_cfg: SRConfig, class_ids: Tuple[int, ...],
                        mode: str = "argmax", th_factor: float = 0.15,
                        global_normalize: bool = True,
                        sr_types: Tuple[str, ...] = ("aug", "max", "mean"),
                        chunk_size: int = 0,
                        class_chunk: int = 0,
                        dropout_key: Optional[jax.Array] = None,
                        gram_coeffs: Optional[jnp.ndarray] = None,
                        return_targets: bool = False,
                        return_label_map: bool = False,
                        label_map_rule: str = "class_peak"
                        ) -> Dict[str, jnp.ndarray]:
    """Full ASR for one image over MANY classes in one program — the
    capability the reference explicitly lacks (single fixed class_id per run,
    reference README.md:5-6, which would need K separate staged runs).

    The expensive, class-independent work is shared: one copies warp + one
    DeepLabV3+ forward feed every class, and the Gram stencil (gram_coeffs /
    solver_impl="gram"/"cg") depends only on (angles, shifts, cfg) — image and
    class content enter the normal equations only through b = A^T y — so all K
    solves reuse one stencil and run vmapped over the class axis. Marginal
    cost per extra class is one OPM selection + one solve (+ optional
    max/mean inverse-warp stack), not a pipeline rerun.

    Returns the asr_step dict with a leading class axis: each value is
    (K, H, W, 1) float32 with values {0, class_ids[k]} in slice k, ordered as
    class_ids. Per-class slices match asr_step(class_id=class_ids[k], ...)
    exactly (tests/test_multiclass.py).

    return_label_map: also emit 'label_map' — a single (H, W, 1) full-scene
    HR segmentation combining the per-class aug-SR targets (best-scoring
    class above threshold per pixel, else background) — plus
    'label_map_standard', the plain model's upsampled argmax labels, for
    side-by-side mean-IoU scoring. Requires "aug" in sr_types.

    class_chunk: process classes in groups of this size (lax.map) instead of
    all K at once. The per-class b = A^T y warps and the flat K*num_aug
    max/mean inverse-warp stack dominate the program's memory at large K;
    chunking bounds that peak to ~class_chunk/K of the full vmap (needed for
    batched 20-class serving: batch=4 x 20 classes compile-OOMs unchunked at
    31.6 GB vs 15.75 GB HBM on one v5e chip). Results are identical.
    """
    num_aug = sr_cfg.num_aug
    if model_cfg.compute_dtype == "bfloat16":
        image = image.astype(jnp.bfloat16)
    copies = make_augmented_copies(image, angles, shifts, num_aug,
                                   warp_impl=sr_cfg.warp_impl,
                                   angle_max=sr_cfg.angle_max)

    if chunk_size and num_aug > chunk_size and num_aug % chunk_size == 0:
        chunks = copies.reshape((num_aug // chunk_size, chunk_size) + copies.shape[1:])
        preds = jax.lax.map(lambda c: forward(params, c, model_cfg), chunks)
        preds = preds.reshape((num_aug,) + preds.shape[2:])
    else:
        preds = forward(params, copies, model_cfg)

    cls = jnp.asarray(class_ids, jnp.int32)
    class_masks, max_masks = extract_masks_multiclass(preds, cls, mode)
    prep = partial(prepare_sr_inputs, mode=mode,
                   global_normalize=global_normalize)
    if max_masks is None:
        class_masks = jax.vmap(lambda m: prep(m, None)[0])(class_masks)
    else:
        class_masks, max_masks = jax.vmap(prep)(class_masks, max_masks)

    # Per-class dropout keys preserve the single-class semantics (each class's
    # solve draws its own mask, as K separate runs would).
    keys = (jax.random.split(dropout_key, len(class_ids))
            if dropout_key is not None else None)

    k_cls = len(class_ids)
    chunked = 0 < class_chunk < k_cls

    def maybe_chunked(run, *arrays):
        """run(*arrays) over all K classes, or in class_chunk groups."""
        if chunked:
            return _map_class_chunks(lambda a: run(*a), arrays,
                                     k_cls, class_chunk)
        return run(*arrays)

    def solve_aug(masks, key):
        return augmented_superresolution(masks, angles, shifts, sr_cfg,
                                         dropout_key=key,
                                         gram_coeffs=gram_coeffs)[0]

    def vmap_aug(masks):
        if keys is None:
            return maybe_chunked(jax.vmap(lambda m: solve_aug(m, None)),
                                 masks)
        return maybe_chunked(jax.vmap(solve_aug), masks, keys)

    def run_max_mean(masks):
        return maybe_chunked(
            lambda m: multiclass_max_mean_superresolution(m, angles, shifts,
                                                          sr_cfg), masks)

    # max/mean share ONE flat inverse-warp stack across classes AND both
    # reductions (the shear warp wants a flat 4-D batch; vmap would loop it).
    targets: Dict[str, Tuple[jnp.ndarray, Optional[jnp.ndarray]]] = {}
    if "max" in sr_types or "mean" in sr_types:
        mx, mean = run_max_mean(class_masks)
        targets["max"], targets["mean"] = (mx, None), (mean, None)
        if mode == "slice_max" and max_masks is not None:
            mx_m, mean_m = run_max_mean(max_masks)
            targets["max"], targets["mean"] = (mx, mx_m), (mean, mean_m)

    results: Dict[str, jnp.ndarray] = {}
    aug_targets = None
    for sr_type in sr_types:
        if sr_type in targets:
            target_class, target_max = targets[sr_type]
        else:  # "aug"
            target_class = vmap_aug(class_masks)
            aug_targets = target_class
            target_max = (vmap_aug(max_masks)
                          if mode == "slice_max" and max_masks is not None
                          else None)
        if target_max is not None:
            th = jax.vmap(lambda t, m, c: threshold_image(t, c, th_mask=m)
                          )(target_class, target_max, cls)
        else:
            th = jax.vmap(
                lambda t, c: threshold_image(t, c, th_factor=th_factor)
            )(target_class, cls)
        results[sr_type] = th.astype(jnp.float32)
        if return_targets:
            results[sr_type + "_target"] = target_class.astype(jnp.float32)

    hr_logits = resize(preds[0], model_cfg.input_shape[:2], method="bilinear")
    standard = jnp.argmax(hr_logits, axis=-1)[..., None]
    results["standard"] = jax.vmap(
        lambda c: jnp.where(standard == c, standard, 0).astype(jnp.float32)
    )(cls)

    if return_label_map and aug_targets is not None:
        # Full-scene HR segmentation from the per-class SR targets — a
        # product the reference cannot emit at all (one class per run).
        # Cross-class score normalization + threshold live in
        # sr/postprocess.py combine_label_map; rule selection is evidenced
        # by scripts/label_map_eval.py --rules (see its docstring).
        label = combine_label_map(aug_targets, cls, th_factor,
                                  rule=label_map_rule)
        results["label_map"] = label.astype(jnp.float32)
        results["label_map_standard"] = standard.astype(jnp.float32)
    return results
