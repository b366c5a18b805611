"""Score the full-scene HR label_map product — the flagship beyond-reference
capability (pipeline/end_to_end.py asr_step_multiclass return_label_map).

The reference recovers ONE class per staged run (reference README.md:5-6,
SR_single_class.py fixed class_id); it has no full-scene HR segmentation
product at all. This script measures ours: on a held-out multi-class scene
set, run the multi-class ASR program (shared forward + shared Gram stencil,
per-class solves) with return_label_map=True and report

  * mean IoU of `label_map`          (per-class aug-SR targets, best class
                                      above threshold per pixel)
  * mean IoU of `label_map_standard` (the plain model's upsampled argmax —
                                      what a user gets WITHOUT ASR)

over scenes containing multiple foreground classes, so the committed number
is a measured quality win for the product, not just a mechanism test
(VERDICT r3 next #7).

Usage (one v5e chip):
    python scripts/label_map_eval.py --load_params /tmp/ckpt.npz \
        --hard --out experiments/label_map_hard.json
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
os.environ.setdefault("TPU_WORKER_ID", "0")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load_params", required=True, nargs="+",
                    help=".npz checkpoint(s) (e.g. quality_demo/"
                         "per_class_validation --save_params or cli/train.py "
                         "output). With several, every checkpoint is scored "
                         "on the SAME scenes/TTA/stencil in one process — "
                         "the multiclass program compiles once (params are "
                         "a traced argument) and the JSON carries one arm "
                         "per checkpoint")
    ap.add_argument("--backbone", default="xception",
                    choices=["xception", "mobilenet"])
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--eval_images", type=int, default=20)
    ap.add_argument("--class_ids", type=int, nargs="+", default=[8, 12])
    ap.add_argument("--num_aug", type=int, default=100)
    ap.add_argument("--num_iter", type=int, default=300)
    ap.add_argument("--th_factor", type=float, default=0.65)
    ap.add_argument("--class_chunk", type=int, default=0)
    ap.add_argument("--hard", action="store_true",
                    help="hard-scene recipe (data/synthetic.py)")
    ap.add_argument("--seed", type=int, default=4321)
    ap.add_argument("--rules", nargs="+", default=None,
                    choices=["class_peak", "scene_peak", "raw", "gated"],
                    help="ALSO score these cross-class combination rules "
                         "(sr/postprocess.py combine_label_map) from the "
                         "same per-class SR targets — one TPU pass, one "
                         "score per rule. At many classes the class_peak "
                         "rule inflates ABSENT-class noise to peak 1.0; "
                         "this mode measures how much that costs")
    ap.add_argument("--raw_th", type=float, default=0.5,
                    help="absolute score floor for the 'raw' rule "
                         "(argmax-mode SR targets approximate {0,1} masks)")
    ap.add_argument("--out", default="label_map_eval.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from deeplabv3plus_augmented_superresolution_tpu.data.synthetic import (
        synthetic_scene,
    )
    from deeplabv3plus_augmented_superresolution_tpu.metrics import mean_iou
    from deeplabv3plus_augmented_superresolution_tpu.models import (
        DeepLabConfig,
        build_model,
    )
    from deeplabv3plus_augmented_superresolution_tpu.pipeline import (
        asr_step_multiclass,
        sample_augmentations,
    )
    from deeplabv3plus_augmented_superresolution_tpu.sr import (
        OptimizerConfig,
        SRConfig,
        precompute_gram_stencil,
    )

    size = args.size
    model_cfg = DeepLabConfig(
        input_shape=(size, size, 3), classes=21, backbone=args.backbone,
        weights=None, final_upsample=False, compute_dtype="bfloat16")
    arms = {}
    for path in args.load_params:
        label = os.path.splitext(os.path.basename(path))[0]
        arms[label], _ = build_model(model_cfg, seed=0, weights_path=path)

    feat = size // (4 if args.backbone == "xception" else 8)
    sr_cfg = SRConfig(
        lambda_df=1.0, lambda_tv=0.3, lambda_L2=0.7, num_iter=args.num_iter,
        num_aug=args.num_aug, feature_size=(feat, feat),
        output_size=(size, size), angle_max=0.16, solver_impl="gram",
        optimizer=OptimizerConfig(learning_rate=1e-3, amsgrad=True,
                                  lr_scheduler=True, decay_steps=60,
                                  decay_rate=0.3))
    shift_max = 80.0 * size / 512.0

    # Held-out scenes that actually contain MULTIPLE foreground classes —
    # the full-scene product is only interesting when there is a scene.
    rng = np.random.default_rng(args.seed)
    want = set(args.class_ids)
    scenes = []
    while len(scenes) < args.eval_images:
        img, lab = synthetic_scene(rng, (size, size),
                                   class_ids=tuple(args.class_ids),
                                   max_shapes=4, hard=args.hard)
        present = set(np.unique(lab).tolist()) & want
        if len(present) >= 2:
            scenes.append((img, lab))
    print(f"[label_map_eval] {len(scenes)} held-out scenes with >=2 of "
          f"classes {sorted(want)}", flush=True)

    angles, shifts = sample_augmentations(jax.random.key(args.seed),
                                          args.num_aug, 0.15, shift_max)
    gram_coeffs = jax.jit(precompute_gram_stencil,
                          static_argnames=("cfg",))(angles, shifts, sr_cfg)

    from deeplabv3plus_augmented_superresolution_tpu.metrics import (
        single_class_iou,
    )

    from deeplabv3plus_augmented_superresolution_tpu.sr import (
        combine_label_map,
    )

    cls_arr = jnp.asarray(args.class_ids, jnp.int32)

    def evaluate(params, label):
        lm_ious, std_ious = [], []
        rule_ious = {r: [] for r in (args.rules or [])}
        per_class = {c: {"lm": [], "std": []} for c in args.class_ids}
        t0 = time.time()
        for i, (img, lab) in enumerate(scenes):
            out = asr_step_multiclass(
                params, jnp.asarray(img), angles, shifts, model_cfg, sr_cfg,
                class_ids=tuple(args.class_ids), mode="argmax",
                th_factor=args.th_factor, class_chunk=args.class_chunk,
                gram_coeffs=gram_coeffs, return_label_map=True,
                return_targets=bool(args.rules))
            lm = np.asarray(out["label_map"])[..., 0]
            std = np.asarray(out["label_map_standard"])[..., 0]
            lm_ious.append(float(mean_iou(lab, lm)))
            std_ious.append(float(mean_iou(lab, std)))
            for r in rule_ious:
                alt = combine_label_map(
                    out["aug_target"], cls_arr,
                    args.raw_th if r == "raw" else args.th_factor, rule=r)
                rule_ious[r].append(
                    float(mean_iou(lab, np.asarray(alt)[..., 0])))
            for c in args.class_ids:
                if (lab == c).any():
                    per_class[c]["lm"].append(
                        float(single_class_iou(lab, lm, c)))
                    per_class[c]["std"].append(
                        float(single_class_iou(lab, std, c)))
            print(f"[label_map_eval] {label} scene {i}: label_map "
                  f"{lm_ious[-1]:.4f} standard {std_ious[-1]:.4f}"
                  + "".join(f" {r} {rule_ious[r][-1]:.4f}"
                            for r in rule_ious),
                  flush=True)
        return {
            **({"by_rule": {
                r: {"mean_iou": round(float(np.mean(v)), 4),
                    "minus_standard": round(
                        float(np.mean(v)) - float(np.mean(std_ious)), 4),
                    "win_rate_vs_standard": round(
                        float(np.mean([a >= b for a, b in
                                       zip(v, std_ious)])), 3)}
                for r, v in rule_ious.items()}} if rule_ious else {}),
            "eval_s": round(time.time() - t0, 1),
            "label_map_mean_iou": round(float(np.mean(lm_ious)), 4),
            "label_map_standard_mean_iou": round(
                float(np.mean(std_ious)), 4),
            "label_map_minus_standard": round(
                float(np.mean(lm_ious)) - float(np.mean(std_ious)), 4),
            "win_rate_vs_standard": round(
                float(np.mean([a >= b
                               for a, b in zip(lm_ious, std_ious)])), 3),
            "per_class_iou": {
                str(c): {"label_map": round(float(np.mean(v["lm"])), 4),
                         "standard": round(float(np.mean(v["std"])), 4),
                         "n": len(v["lm"])}
                for c, v in per_class.items() if v["lm"]},
        }

    shared = {
        "backbone": args.backbone, "size": size,
        "eval_images": len(scenes), "class_ids": args.class_ids,
        "num_aug": args.num_aug, "num_iter": args.num_iter,
        "th_factor": args.th_factor, "hard_scenes": args.hard,
        "class_chunk": args.class_chunk,
        "loaded_params": args.load_params, "seed": args.seed,
        "note": ("label_map = full-scene HR segmentation from per-class "
                 "aug-SR targets (the reference has no such product: one "
                 "class per staged run); standard = plain upsampled argmax "
                 "labels from the same forward"),
    }
    blocks = {label: evaluate(params, label)
              for label, params in arms.items()}
    if len(blocks) == 1:
        result = {**shared, **next(iter(blocks.values()))}
        headline = {k: result[k] for k in
                    ("label_map_mean_iou", "label_map_standard_mean_iou",
                     "label_map_minus_standard", "win_rate_vs_standard")}
    else:
        result = {**shared, "arms": blocks,
                  "paired_design": ("identical scenes + TTA set + Gram "
                                    "stencil for every checkpoint")}
        headline = {label: {
            "label_map_mean_iou": b["label_map_mean_iou"],
            "label_map_minus_standard": b["label_map_minus_standard"],
            "win_rate_vs_standard": b["win_rate_vs_standard"],
            **({"by_rule": b["by_rule"]} if "by_rule" in b else {})}
            for label, b in blocks.items()}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2, allow_nan=False)
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
