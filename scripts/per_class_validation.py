"""Full 20-class per-class validation — the reference's headline artifact
(`experiments_data/final_validations/argmax_validation_final.csv`: one row
per VOC foreground class, 6 IoU columns) reproduced end to end in-container.

The reference produces that CSV with 20 *separate staged runs* (one
generate_augmented_copies + SR_single_class pair per class_id, reference
README.md:5-6) against VOC + the downloaded bonlime checkpoint. Neither is
fetchable here, so this script:

  1. trains ONE DeepLabV3+ from scratch on procedural scenes drawn across
     all 20 foreground classes (data/synthetic.py, 20-color palette),
  2. runs the multi-class ASR program (pipeline.asr_step_multiclass — one
     compile, shared forward + shared Gram stencil; per-class slices are
     test-pinned identical to 20 staged asr_step runs,
     tests/test_multiclass.py) once per held-out scene with per-scene
     redrawn TTA (the reference's strict staged protocol,
     reference augmentation_utils.py:14-15),
  3. aggregates, per class, over the scenes that contain it (the
     reference's filter_images_by_class staging, superres_utils.py:41-53),
     the reference's exact 6 IoU variants (SR_single_class.py:109-141):
     aug/standard x with/without background, plus max/mean SR,
  4. emits the CSV in the reference's exact schema plus a JSON with
     20-class averages next to the reference's published ones
     (BASELINE.md rows 1-6).

Usage (one v5e chip; ~15 min for train + 3 OPM modes):
    python scripts/per_class_validation.py --hard \
        --modes argmax slice slice_max --out_prefix experiments/per_class
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

# Reference published 20-class averages (BASELINE.md §6 / final_validations
# CSVs) keyed by our mode names; slice == the reference's "slice_var" CSV.
_REFERENCE_PUBLISHED = {
    "argmax": {"aug": 0.6841, "standard": 0.6751, "max": 0.6230,
               "mean": 0.6749, "aug_with_bg": 0.8148,
               "standard_with_bg": 0.8119},
    "slice": {"aug": 0.6103, "standard": 0.6751},
    "slice_max": {"aug": 0.4849, "standard": 0.6751},
}

CSV_HEADER = ('"Name","aug_iou_multiple","standard_iou_multiple",'
              '"aug_iou_single","standard_iou_single","max_iou","mean_iou"')


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--backbone", default="xception",
                    choices=["xception", "mobilenet"])
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--num_classes", type=int, default=20,
                    help="foreground classes validated (ids 1..N; 20 = the "
                         "reference's full VOC table)")
    ap.add_argument("--train_steps", type=int, default=1000)
    ap.add_argument("--train_batch", type=int, default=8)
    ap.add_argument("--train_set", type=int, default=320)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--scenes", type=int, default=120,
                    help="held-out eval scene pool; every scene is scored "
                         "for each class it contains")
    ap.add_argument("--min_class_n", type=int, default=10,
                    help="top up the pool with targeted scenes until every "
                         "class appears in at least this many")
    ap.add_argument("--max_shapes", type=int, default=4)
    ap.add_argument("--num_aug", type=int, default=100)
    ap.add_argument("--num_iter", type=int, default=300)
    ap.add_argument("--th_factor", type=float, default=0.65)
    ap.add_argument("--modes", nargs="+", default=["argmax"],
                    choices=["argmax", "slice", "slice_max"],
                    help="OPM modes; the reference publishes all three "
                         "(argmax / slice_var / slice_max CSVs)")
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--hard", action="store_true",
                    help="de-saturated scene recipe (data/synthetic.py)")
    ap.add_argument("--warp_augment", action="store_true",
                    help="train on the TTA distribution (garbage-vote fix)")
    ap.add_argument("--class_chunk", type=int, default=0)
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--save_params", default="")
    ap.add_argument("--load_params", default="")
    ap.add_argument("--train_only", action="store_true",
                    help="train + --save_params, then exit (checkpoint "
                         "factory for label_map_eval and friends)")
    ap.add_argument("--quick", action="store_true",
                    help="tiny CPU configuration (CI); explicit flags still "
                         "override the quick defaults")
    ap.add_argument("--out_prefix", default="per_class")
    if "--quick" in sys.argv:
        # Defaults only — any explicitly passed flag wins (the CI test
        # shrinks further). lr 3e-3 / 300 steps: same basin-escape logic as
        # quality_demo --quick (tests/test_training.py).
        ap.set_defaults(backbone="mobilenet", alpha=0.35, size=96,
                        num_classes=4, train_steps=300, train_batch=4,
                        train_set=32, lr=3e-3, scenes=6, min_class_n=2,
                        num_aug=8, num_iter=30, compute_dtype="float32")
    args = ap.parse_args()

    if args.quick:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from deeplabv3plus_augmented_superresolution_tpu.data.synthetic import (
        synthetic_batch,
        synthetic_scene,
    )
    from deeplabv3plus_augmented_superresolution_tpu.metrics import (
        single_class_iou,
    )
    from deeplabv3plus_augmented_superresolution_tpu.models import (
        DeepLabConfig,
        build_model,
        init_params,
        make_train_step,
        save_params_npz,
    )
    from deeplabv3plus_augmented_superresolution_tpu.pipeline import (
        asr_step_multiclass,
        sample_augmentations,
    )
    from deeplabv3plus_augmented_superresolution_tpu.sr import (
        OptimizerConfig,
        SRConfig,
    )

    rng = np.random.default_rng(args.seed)
    class_ids = tuple(range(1, args.num_classes + 1))
    size = args.size

    # ---- 1. one model across all classes ----------------------------------
    train_cfg = DeepLabConfig(
        input_shape=(size, size, 3), classes=21, backbone=args.backbone,
        alpha=args.alpha, weights=None, final_upsample=True,
        compute_dtype=args.compute_dtype)
    params = init_params(train_cfg, seed=0)

    print(f"[per_class] generating {args.train_set} training scenes "
          f"({args.num_classes} classes, hard={args.hard})", flush=True)
    imgs, labs = synthetic_batch(rng, args.train_set, size=(size, size),
                                 class_ids=class_ids,
                                 max_shapes=args.max_shapes, hard=args.hard)
    if args.load_params:
        params, _ = build_model(train_cfg, params=params,
                                weights_path=args.load_params)
        final_loss, train_s = None, 0.0
        print(f"[per_class] loaded params from {args.load_params}")
    else:
        ds_img = jnp.asarray((imgs * 255).astype(np.uint8))
        ds_lab = jnp.asarray(labs.astype(np.uint8))
        tx = optax.adam(args.lr)
        opt_state = tx.init(params)
        step = make_train_step(train_cfg, tx, bn_momentum=0.9)

        def train_chunk(params, opt_state, data_img, data_lab, keys):
            def body(carry, key):
                p, o = carry
                k_idx, k_aug = jax.random.split(key)
                idx = jax.random.randint(k_idx, (args.train_batch,), 0,
                                         data_img.shape[0])
                im = data_img[idx].astype(jnp.float32) / 255.0
                lb = data_lab[idx].astype(jnp.int32)
                if args.warp_augment:
                    from deeplabv3plus_augmented_superresolution_tpu.pipeline import (  # noqa: E501
                        warp_augment_batch,
                    )
                    im, lb = warp_augment_batch(
                        k_aug, im, lb, angle_max=0.15,
                        shift_max=80.0 * size / 512.0)
                p, o, loss = step(p, o, im, lb)
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), keys)
            return params, opt_state, losses

        train_chunk = jax.jit(train_chunk, donate_argnums=(0, 1))
        key = jax.random.key(args.seed)
        t0 = time.time()
        losses_all = []
        done = 0
        while done < args.train_steps:
            n = min(50, args.train_steps - done)
            keys = jax.random.split(jax.random.fold_in(key, done), n)
            params, opt_state, losses = train_chunk(params, opt_state,
                                                    ds_img, ds_lab, keys)
            losses_all.extend(np.asarray(losses).tolist())
            done += n
            print(f"[per_class] step {done}/{args.train_steps} "
                  f"loss {losses_all[-1]:.4f}", flush=True)
        train_s = time.time() - t0
        final_loss = losses_all[-1]
        print(f"[per_class] trained in {train_s:.1f}s "
              f"(loss {losses_all[0]:.3f} -> {final_loss:.4f})")
    if args.save_params:
        save_params_npz(jax.device_get(params), args.save_params)
        print(f"[per_class] params -> {args.save_params}")
    if args.train_only:
        # Checkpoint-factory mode: downstream evals (e.g.
        # scripts/label_map_eval.py at 20 classes) reuse the exact
        # all-classes training recipe without repeating the committed
        # validation sweep.
        print("[per_class] --train_only: skipping the validation phases")
        return

    # ---- 2. held-out scene pool (every class >= min_class_n scenes) -------
    eval_imgs, eval_labs = synthetic_batch(
        rng, args.scenes, size=(size, size), class_ids=class_ids,
        max_shapes=args.max_shapes, hard=args.hard)
    eval_imgs, eval_labs = list(eval_imgs), list(eval_labs)

    def class_count():
        counts = {c: 0 for c in class_ids}
        for lab in eval_labs:
            for c in np.unique(lab):
                if c in counts:
                    counts[int(c)] += 1
        return counts

    counts = class_count()
    for c in class_ids:
        while counts[c] < args.min_class_n:
            # Targeted top-up: a scene whose shape pool contains c (plus two
            # random other classes), redrawn until c survives occlusion.
            others = rng.choice([k for k in class_ids if k != c], size=2,
                                replace=False)
            img, lab = synthetic_scene(
                rng, (size, size), (c, int(others[0]), int(others[1])),
                max_shapes=args.max_shapes, hard=args.hard)
            if not np.any(lab == c):
                continue
            eval_imgs.append(img)
            eval_labs.append(lab)
            for k in np.unique(lab):
                if int(k) in counts:
                    counts[int(k)] += 1
    print(f"[per_class] eval pool: {len(eval_imgs)} scenes; per-class n: "
          f"{sorted(counts.values())}", flush=True)

    # ---- 3. multi-class ASR once per scene, per mode -----------------------
    feat = size // (4 if args.backbone == "xception" else 8)
    model_cfg = dataclasses.replace(train_cfg, final_upsample=False)
    sr_cfg = SRConfig(
        lambda_df=1.0, lambda_tv=0.3, lambda_L2=0.7, num_iter=args.num_iter,
        num_aug=args.num_aug, feature_size=(feat, feat),
        output_size=(size, size), angle_max=0.16, solver_impl="gram",
        optimizer=OptimizerConfig(learning_rate=1e-3, amsgrad=True,
                                  lr_scheduler=True, decay_steps=60,
                                  decay_rate=0.3))
    shift_max = 80.0 * size / 512.0
    arms = ("aug", "max", "mean", "standard")

    summary = {
        "backbone": args.backbone, "size": size,
        "num_classes": args.num_classes, "hard_scenes": args.hard,
        "warp_augment": args.warp_augment,
        "train_steps": 0 if args.load_params else args.train_steps,
        "train_loss_final": final_loss, "train_s": round(train_s, 1),
        "scenes": len(eval_imgs), "num_aug": args.num_aug,
        "num_iter": args.num_iter, "th_factor": args.th_factor,
        "seed": args.seed, "loaded_params": args.load_params or None,
        "modes": {},
    }

    def sanitize(x):
        if isinstance(x, float) and not (x == x and abs(x) != float("inf")):
            return None
        if isinstance(x, dict):
            return {k: sanitize(v) for k, v in x.items()}
        if isinstance(x, list):
            return [sanitize(v) for v in x]
        return x

    json_path = f"{args.out_prefix}_validation.json"
    if os.path.exists(json_path):
        # Merge: a rerun of one mode (e.g. after a TPU-worker fault killed a
        # later arm) must not discard the modes an earlier run already
        # finished. Current-run modes overwrite same-named prior entries.
        try:
            with open(json_path) as f:
                summary["modes"].update(json.load(f).get("modes", {}))
        except (json.JSONDecodeError, OSError):
            pass  # corrupt/partial file: start fresh

    def write_summary():
        # Incremental: one finished mode is durable even if a later mode's
        # run dies (TPU worker faults are a fact of life on the tunnel).
        with open(json_path, "w") as f:
            json.dump(sanitize(summary), f, indent=2, allow_nan=False)

    for mode in args.modes:
        # Per class c: lists of the reference's 6 IoU variants over the
        # scenes containing c (reference SR_single_class.py:109-141).
        per_class = {c: {"aug_iou_multiple": [], "standard_iou_multiple": [],
                         "aug_iou_single": [], "standard_iou_single": [],
                         "max_iou": [], "mean_iou": []} for c in class_ids}
        t0 = time.time()
        for i, (img, lab) in enumerate(zip(eval_imgs, eval_labs)):
            angles, shifts = sample_augmentations(
                jax.random.fold_in(jax.random.key(args.seed + 1), i),
                args.num_aug, 0.15, shift_max)
            out = asr_step_multiclass(
                params, jnp.asarray(img), angles, shifts, model_cfg, sr_cfg,
                class_ids=class_ids, mode=mode, th_factor=args.th_factor,
                class_chunk=args.class_chunk)
            present = [int(c) for c in np.unique(lab) if c in per_class]
            # Fetch only the present classes' slices: pulling all K arms
            # through the tunnel costs ~4*K MB/scene (measured ~7 s/scene at
            # K=20/512 px); device-side indexing cuts it ~K/len(present)x.
            idx = jnp.asarray([c - 1 for c in present], jnp.int32)
            out = {a: np.asarray(out[a][idx]) for a in arms}
            for j, c in enumerate(present):
                k = j  # row j of the fetched subset is class `present[j]`
                d = per_class[c]
                d["aug_iou_single"].append(
                    float(single_class_iou(lab, out["aug"][k], c)))
                d["aug_iou_multiple"].append(
                    float(single_class_iou(lab, out["aug"][k], c,
                                           include_bg=True)))
                d["standard_iou_single"].append(
                    float(single_class_iou(lab, out["standard"][k], c)))
                d["standard_iou_multiple"].append(
                    float(single_class_iou(lab, out["standard"][k], c,
                                           include_bg=True)))
                d["max_iou"].append(
                    float(single_class_iou(lab, out["max"][k], c)))
                d["mean_iou"].append(
                    float(single_class_iou(lab, out["mean"][k], c)))
            if (i + 1) % 20 == 0:
                print(f"[per_class] {mode}: scene {i + 1}/{len(eval_imgs)} "
                      f"({time.time() - t0:.0f}s)", flush=True)
        eval_s = time.time() - t0

        cols = ("aug_iou_multiple", "standard_iou_multiple",
                "aug_iou_single", "standard_iou_single", "max_iou",
                "mean_iou")
        rows = []
        for c in class_ids:
            means = {k: float(np.mean(v)) if v else float("nan")
                     for k, v in per_class[c].items()}
            means["n"] = len(per_class[c]["aug_iou_single"])
            rows.append((c, means))

        csv_path = f"{args.out_prefix}_validation_{mode}.csv"
        with open(csv_path, "w") as f:
            f.write(CSV_HEADER + "\n")
            for c, m in rows:
                f.write(f'"Class {c}",' + ",".join(
                    f'"{m[k]}"' for k in cols) + "\n")

        avg = {k: float(np.mean([m[k] for _, m in rows])) for k in cols}
        summary["modes"][mode] = {
            "csv": csv_path, "eval_s": round(eval_s, 1),
            "class_avg": avg,
            "aug_minus_standard_single": round(
                avg["aug_iou_single"] - avg["standard_iou_single"], 4),
            "per_class_n": {c: m["n"] for c, m in rows},
            "reference_published_class_avg": _REFERENCE_PUBLISHED.get(mode),
        }
        print(f"[per_class] {mode}: 20-class avg aug "
              f"{avg['aug_iou_single']:.4f} vs standard "
              f"{avg['standard_iou_single']:.4f} "
              f"({avg['aug_iou_single'] - avg['standard_iou_single']:+.4f}); "
              f"max {avg['max_iou']:.4f} mean {avg['mean_iou']:.4f} "
              f"-> {csv_path}", flush=True)
        write_summary()

    print(f"[per_class] summary -> {json_path}")


if __name__ == "__main__":
    main()
