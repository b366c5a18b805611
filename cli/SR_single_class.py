"""Augmented Super-Resolution over precomputed hdf5 stacks (reference
SR_single_class.py): load each staged file, run aug/max/mean SR, compute the
six IoU variants vs ground truth and the standard baseline, print averages.

Flags replace the reference's edit-in-source constant block
(SR_single_class.py:22-32); defaults match it.
"""

import argparse
import os

from _common import IMG_SIZE, SEED, add_sr_args, data_paths, make_sr_config

parser = argparse.ArgumentParser()
parser.add_argument("--num_aug", type=int, default=100)
parser.add_argument("--num_samples", type=int, default=500)
parser.add_argument("--class_id", type=int, default=8, choices=range(21))
parser.add_argument("--mode", type=str, default="argmax",
                    choices=["slice_max", "slice", "argmax"])
parser.add_argument("--backbone", type=str, default="xception",
                    choices=["mobilenet", "xception"])
parser.add_argument("--use_validation", action="store_true", default=True)
parser.add_argument("--no_validation", dest="use_validation", action="store_false")
parser.add_argument("--th_factor", type=float, default=0.65)
parser.add_argument("--angle_max", type=float, default=0.5,
                    help="static bound on generation angles (warp window sizing)")
parser.add_argument("--save_slice_output", action="store_true")
parser.add_argument("--save_final_sr_output", action="store_true")
add_sr_args(parser)


def main():
    return run(parser.parse_args())


# Shared-TTA stencil reuse: when staged files carry identical (angles,
# shifts) (generate_augmented_copies --shared_tta), the gram solver's probe
# extraction is paid ONCE — the second time a TTA set repeats WITHIN a run,
# its stencil is precomputed and reused for every remaining file. The cache
# is module-level so it also persists ACROSS sweep trials (sweep_agent calls
# run() in-process; G depends on the staged geometry and operator config,
# not the lambdas). Per-image-TTA staging never repeats a key within a run,
# so it never triggers a standalone extraction (the inline-extraction solve
# is strictly cheaper there).
_STENCIL_CACHE = {}
_EXTRACT_JIT = None


def _shared_stencil(tta_key, run_seen, angles, shifts, sr_cfg):
    """Stencil for a TTA set repeating within this run (or already cached
    from an earlier trial), else None."""
    global _EXTRACT_JIT
    import jax

    from deeplabv3plus_augmented_superresolution_tpu.sr import (
        precompute_gram_stencil,
    )

    key = tta_key + (sr_cfg.num_aug, sr_cfg.feature_size, sr_cfg.output_size,
                     sr_cfg.angle_max, sr_cfg.operator_impl, sr_cfg.warp_impl,
                     sr_cfg.solve_dtype, sr_cfg.gram_probing)
    if key in _STENCIL_CACHE:
        return _STENCIL_CACHE[key]
    if key not in run_seen:
        run_seen.add(key)
        return None
    if _EXTRACT_JIT is None:  # one persistent wrapper: compile once
        _EXTRACT_JIT = jax.jit(precompute_gram_stencil,
                               static_argnames=("cfg",))
    _STENCIL_CACHE.clear()  # one live stencil (66 MB at 512px)
    _STENCIL_CACHE[key] = _EXTRACT_JIT(angles, shifts, sr_cfg)
    return _STENCIL_CACHE[key]


def run(args):
    """Evaluate the staged class subset with args' hyperparameters; returns
    the six average IoUs. Importable entry for sweep_script/sweep_agent."""
    paths = data_paths(args.use_validation, args.backbone, args.mode,
                       args.class_id, args.num_aug)

    import jax
    import numpy as np
    from tqdm import tqdm

    from deeplabv3plus_augmented_superresolution_tpu.data import (
        list_precomputed_data_paths,
        load_image,
        load_sr_data,
    )
    from deeplabv3plus_augmented_superresolution_tpu.metrics import compute_iou
    from deeplabv3plus_augmented_superresolution_tpu.sr.orchestrate import compute_sr

    path_list = list_precomputed_data_paths(paths["augmented_copies_dir"], sort=True)
    path_list = path_list[:args.num_samples] if args.num_samples else path_list
    if not path_list:
        raise SystemExit(
            f"No precomputed hdf5 files under {paths['augmented_copies_dir']} — "
            "run cli/generate_augmented_copies.py first")

    agg = {k: [] for k in ["standard_single", "standard_multiple", "aug_single",
                           "aug_multiple", "max", "mean"]}
    run_seen = set()  # TTA keys seen in THIS run (shared-staging detection)

    for filepath in tqdm(path_list):
        try:
            class_masks, max_masks, angles, shifts, filename = load_sr_data(
                filepath, num_aug=args.num_aug, global_normalize=True)
        except Exception:
            print(f"File: {filepath} is invalid, skipping...")
            continue

        true_mask = load_image(
            os.path.join(paths["pascal_root"], "SegmentationClassAug", f"{filename}.png"),
            image_size=IMG_SIZE, normalize=False, is_png=True, resize_method="nearest")
        standard_mask = load_image(
            os.path.join(paths["standard_output_dir"], f"{filename}.png"),
            image_size=IMG_SIZE, normalize=False, is_png=True, resize_method="nearest")

        import jax.numpy as jnp
        tta_key = (np.asarray(angles).tobytes(), np.asarray(shifts).tobytes())
        angles = jnp.asarray(angles)
        shifts = jnp.asarray(shifts)
        # LR feature size comes from the staged masks (128 for xception OS16,
        # 64 for mobilenet OS8)
        sr_cfg = make_sr_config(args, num_aug=args.num_aug,
                                feature_size=tuple(class_masks.shape[1:3]))
        gram_coeffs = None
        stencil_ok = (sr_cfg.solver_impl in ("gram", "cg")
                      and sr_cfg.copy_dropout == 0.0
                      and not (0 < sr_cfg.sgd_copies < sr_cfg.num_aug))
        if stencil_ok:
            gram_coeffs = _shared_stencil(tta_key, run_seen, angles, shifts,
                                          sr_cfg)

        results = {}
        for sr_type in ("aug", "max", "mean"):
            results[sr_type] = compute_sr(
                sr_cfg, class_masks, angles, shifts, filename,
                dest_folder=paths["superres_output_dir"], sr_type=sr_type,
                max_masks=max_masks,
                save_intermediate_output=args.save_slice_output,
                save_final_output=args.save_final_sr_output,
                class_id=args.class_id, th_factor=args.th_factor,
                dropout_key=jax.random.key(SEED), gram_coeffs=gram_coeffs)

        agg["standard_single"].append(compute_iou(
            true_mask, standard_mask, img_size=IMG_SIZE, class_id=args.class_id))
        agg["standard_multiple"].append(compute_iou(
            true_mask, standard_mask, img_size=IMG_SIZE, class_id=args.class_id,
            include_bg=True))
        agg["aug_single"].append(compute_iou(
            true_mask, results["aug"], img_size=IMG_SIZE, class_id=args.class_id))
        agg["aug_multiple"].append(compute_iou(
            true_mask, results["aug"], img_size=IMG_SIZE, class_id=args.class_id,
            include_bg=True))
        agg["max"].append(compute_iou(
            true_mask, results["max"], img_size=IMG_SIZE, class_id=args.class_id))
        agg["mean"].append(compute_iou(
            true_mask, results["mean"], img_size=IMG_SIZE, class_id=args.class_id))

    avg = {k: float(np.mean(v)) for k, v in agg.items()}
    print(f"Avg. Standard IoUs (No bg): {avg['standard_single']},  "
          f"Avg. Augmented SR IoUs (No bg): {avg['aug_single']}")
    print(f"Avg. Standard IoUs (with bg): {avg['standard_multiple']},  "
          f"Avg. Augmented SR IoUs (with bg): {avg['aug_multiple']}")
    print(f"Avg. Max SR IoUs: {avg['max']}, Avg. Mean SR IoUs: {avg['mean']}")
    return avg


if __name__ == "__main__":
    main()
