"""One-command mIoU-parity harness vs the reference's published numbers.

The reference's quality bar is its committed experiment CSVs (SURVEY.md §6):
per-class final validations (argmax 0.6841 aug vs 0.6751 standard,
final_validations/argmax_validation_final.csv), the class-8 threshold sweeps
(threshold_data/th_*_500.csv), the best class-8 sweep run (aug-with-bg 0.8780
vs standard 0.8724, sweep_data/argmax_no_norm_l1.csv) and the robustness grid
(robustness_data/robustness_350_class_all.csv). This harness reruns those
workloads end-to-end on the fused TPU pipeline and diffs the aggregates
against the extracted baselines in configs/reference_baselines.json with
stated tolerances, printing a PASS/FAIL table — so the day a pretrained
checkpoint lands at data/model_weights/, quality parity is ONE command:

    python cli/validate_parity.py --weights_path <bonlime .h5> \
        --workloads validation,threshold,sweep,robustness

instead of hand-composing generate_augmented_copies / generate_standard_output
/ SR_single_class / threshold_tests / check_robustness and eyeballing averages
(the reference's own workflow, README.md:35-55).

`--smoke` runs the identical harness machinery tiny (bundled fixture image,
random weights, 6 copies, 5 iterations, 2-point grids) so CI proves the
harness end-to-end without weights or a VOC tree; smoke PASS criteria are
structural (every workload executes, CSVs land in the reference schemas,
the table renders), not quality.

Workload semantics match the reference's staged runs: per-image TTA redraw
(generate_augmented_copies.py:41-44), argmax/slice/slice_max OPMs, 100 copies,
300 Adam iterations, th_factor defaults per mode, IoU variants per
SR_single_class.py:109-141.
"""

import argparse
import csv
import json
import math
import os
import sys

from _common import SEED, build_deeplab, data_paths, make_sr_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

parser = argparse.ArgumentParser()
parser.add_argument("--weights_path", type=str, default=None,
                    help="bonlime .h5 checkpoint (default: data/model_weights/"
                         "<backbone>.h5); required for non-smoke runs")
parser.add_argument("--backbone", type=str, default="xception",
                    choices=["mobilenet", "xception"])
parser.add_argument("--modes", type=str, default="argmax",
                    help="comma list of OPMs for the validation workload "
                         "(argmax,slice,slice_max)")
parser.add_argument("--workloads", type=str,
                    default="validation,threshold,sweep,robustness")
parser.add_argument("--classes", type=str, default="",
                    help="comma list of class ids for validation "
                         "(default 1..20, the reference's per-class runs)")
parser.add_argument("--num_samples_per_class", type=int, default=0,
                    help="validation images per class (0 = all containing it)")
parser.add_argument("--num_aug", type=int, default=100)
parser.add_argument("--num_iter", type=int, default=300)
parser.add_argument("--angle_max_gen", type=float, default=0.15,
                    help="TTA angle draw bound (reference test_SR.py:24)")
parser.add_argument("--shift_max_gen", type=float, default=80.0)
parser.add_argument("--threshold_class", type=int, default=8)
parser.add_argument("--threshold_samples", type=int, default=500)
parser.add_argument("--robustness_samples", type=int, default=350)
parser.add_argument("--robustness_grid", type=str, default="coarse",
                    choices=["coarse", "full"],
                    help="full = the reference's 29x9x9 grid; coarse = the "
                         "5x3x3 subgrid containing the compared aggregates")
parser.add_argument("--baselines", type=str,
                    default=os.path.join(REPO, "configs",
                                         "reference_baselines.json"))
parser.add_argument("--output_dir", type=str, default=None)
parser.add_argument("--batch", type=int, default=1,
                    help="images per device program (vmap)")
parser.add_argument("--smoke", action="store_true",
                    help="tiny end-to-end run on the bundled fixture with "
                         "random weights (CI mode; structural pass criteria)")


def _th_default(mode):
    # reference defaults: 0.2 for argmax (test_SR.py:35), 0.65 for slice modes
    # (SR_single_class.py:28 / best slice_var threshold)
    return 0.2 if mode == "argmax" else 0.65


class Harness:
    def __init__(self, args):
        self.args = args
        self.rows = []  # (workload, name, ours, ref, tol, ok, note)
        with open(args.baselines) as f:
            self.baselines = json.load(f)
        self.out_dir = args.output_dir or os.path.join(
            os.getcwd(), "experiments_data", "parity")
        os.makedirs(self.out_dir, exist_ok=True)

        import jax  # noqa: F401  (device init before any timing)
        cfg, params, _ = build_deeplab(args.backbone, final_upsample=False,
                                       weights_path=args.weights_path)
        self.model_cfg, self.params = cfg, params
        self.img_size = cfg.input_shape[:2]

    # -- data ---------------------------------------------------------------

    def _val_paths(self, class_id, limit):
        from deeplabv3plus_augmented_superresolution_tpu.data import (
            filter_images_by_class,
            get_img_paths,
        )

        if self.args.smoke:
            return [os.path.join(REPO, "test_images", "smoke_input.jpg")]
        paths = data_paths(use_validation=True, backbone=self.args.backbone)
        all_paths = get_img_paths(paths["image_list"], paths["imgs_path"],
                                  sort=True)
        return filter_images_by_class(all_paths, class_id,
                                      num_images=limit or None,
                                      image_size=self.img_size)

    def _gt_path(self, img_path):
        if self.args.smoke:
            return os.path.join(REPO, "test_images", "smoke_gt.png")
        return img_path.replace("JPEGImages", "SegmentationClassAug") \
                       .replace(".jpg", ".png")

    def _load_pair(self, img_path):
        from deeplabv3plus_augmented_superresolution_tpu.data import load_image

        img = load_image(img_path, image_size=self.img_size, normalize=True)
        gt = load_image(self._gt_path(img_path), image_size=self.img_size,
                        normalize=False, is_png=True, resize_method="nearest")
        return img, gt

    # -- workloads ------------------------------------------------------------

    def _asr_masks(self, image, class_id, mode, th_factor, seed,
                   return_targets=False, sr_overrides=None):
        """Full fused pipeline for one image with a fresh per-image TTA set
        (reference per-image redraw semantics)."""
        import jax
        import jax.numpy as jnp

        from deeplabv3plus_augmented_superresolution_tpu.pipeline import (
            asr_step,
            sample_augmentations,
        )

        a = self.args
        angles, shifts = sample_augmentations(
            jax.random.key(seed), a.num_aug, a.angle_max_gen, a.shift_max_gen)
        # overrides (e.g. the sweep row's num_iter/lambdas) take precedence
        # over the CLI-level defaults — merged BEFORE the call so duplicated
        # keys like num_iter don't collide (caught by the full-dress
        # rehearsal, tests/test_cli_integration.py).
        sr_kwargs = dict(
            num_aug=a.num_aug,
            feature_size=tuple(d // (8 if self.model_cfg.backbone == "mobilenet"
                                     else 4) for d in self.img_size),
            output_size=self.img_size, num_iter=a.num_iter,
            angle_max=max(a.angle_max_gen + 0.05, 1e-3))
        sr_kwargs.update(sr_overrides or {})
        sr_cfg = make_sr_config(None, **sr_kwargs)
        out = asr_step(self.params, jnp.asarray(image), angles, shifts,
                       self.model_cfg, sr_cfg, class_id=class_id, mode=mode,
                       th_factor=th_factor, return_targets=return_targets)
        return out

    def run_validation(self, mode):
        import numpy as np

        from deeplabv3plus_augmented_superresolution_tpu.metrics import (
            compute_iou,
        )

        a = self.args
        classes = ([int(c) for c in a.classes.split(",") if c]
                   or ([8] if a.smoke else list(range(1, 21))))
        th = _th_default(mode)
        cols = ["aug_iou_single", "standard_iou_single", "aug_iou_multiple",
                "standard_iou_multiple", "max_iou", "mean_iou"]
        table = []
        for class_id in classes:
            paths = self._val_paths(class_id, a.num_samples_per_class)
            agg = {c: [] for c in cols}
            for i, p in enumerate(paths):
                img, gt = self._load_pair(p)
                out = self._asr_masks(img, class_id, mode, th,
                                      seed=SEED + 7919 * class_id + i)
                masks = {k: np.asarray(v) for k, v in out.items()}
                agg["aug_iou_single"].append(compute_iou(
                    gt, masks["aug"], class_id=class_id))
                agg["aug_iou_multiple"].append(compute_iou(
                    gt, masks["aug"], class_id=class_id, include_bg=True))
                agg["standard_iou_single"].append(compute_iou(
                    gt, masks["standard"], class_id=class_id))
                agg["standard_iou_multiple"].append(compute_iou(
                    gt, masks["standard"], class_id=class_id, include_bg=True))
                agg["max_iou"].append(compute_iou(
                    gt, masks["max"], class_id=class_id))
                agg["mean_iou"].append(compute_iou(
                    gt, masks["mean"], class_id=class_id))
            row = {"Name": f"Class {class_id}"}
            row.update({c: float(np.nanmean(agg[c])) if agg[c] else float("nan")
                        for c in cols})
            table.append(row)
            print(f"[validation/{mode}] {row['Name']}: "
                  f"aug={row['aug_iou_single']:.4f} "
                  f"std={row['standard_iou_single']:.4f} ({len(paths)} imgs)")

        out_csv = os.path.join(self.out_dir, f"{mode}_validation_final.csv")
        with open(out_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["Name"] + cols)
            w.writeheader()
            w.writerows(table)
        print(f"[validation/{mode}] wrote {out_csv}")

        ref = self.baselines["validation"].get(mode)
        tol = self.baselines["tolerances"]["validation_aggregate_iou"]
        for c in cols:
            ours = float(np.nanmean([r[c] for r in table]))
            want = ref["aggregate_mean"].get(c) if ref else None
            self._compare(f"validation/{mode}", c, ours, want, tol,
                          one_sided=not c.startswith("standard"))

    def run_threshold(self, mode="argmax"):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from deeplabv3plus_augmented_superresolution_tpu.metrics import (
            compute_iou,
        )
        from deeplabv3plus_augmented_superresolution_tpu.sr import (
            threshold_image,
        )

        a = self.args
        class_id = a.threshold_class
        if a.smoke:
            th_grid = [0.2, 0.5]
            paths = self._val_paths(class_id, 1)
        else:
            th_grid = [round(0.1 + 0.05 * i, 4) for i in range(17)]
            paths = self._val_paths(class_id, a.threshold_samples)
        per_th = {t: [] for t in th_grid}
        for i, p in enumerate(paths):
            img, gt = self._load_pair(p)
            out = self._asr_masks(img, class_id, mode, th_grid[0],
                                  seed=SEED + i, return_targets=True)
            # one solve, many thresholds (reference threshold_tests.py:104)
            target = jnp.asarray(out["aug_target"])
            for t in th_grid:
                mask = np.asarray(threshold_image(target, class_id,
                                                  th_factor=t))
                per_th[t].append(compute_iou(gt, mask, class_id=class_id))

        out_csv = os.path.join(self.out_dir, f"th_{mode}_{len(paths)}.csv")
        with open(out_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["", "Th_Value", "IoU"])
            for i, t in enumerate(th_grid):
                w.writerow([i, t, float(np.nanmean(per_th[t]))])
        print(f"[threshold/{mode}] wrote {out_csv}")

        means = {t: float(np.nanmean(v)) for t, v in per_th.items()}
        best_t = max(means, key=means.get)
        ref = self.baselines["threshold"].get(mode)
        tol = self.baselines["tolerances"]["threshold_best_iou"]
        self._compare(f"threshold/{mode}", "best_iou", means[best_t],
                      ref and ref["best_iou"], tol, one_sided=True,
                      note=f"@ th={best_t} (ref @ {ref['best_th_factor'] if ref else '?'})")

    def run_sweep(self):
        """The reference's best argmax class-8 sweep run (wandb row
        neat-sweep-42 of sweep_data/argmax_no_norm_l1.csv): rerun its exact
        hyperparameter configuration over the same 500-image class-8 subset
        and compare all six IoU aggregates. The reference produced this row
        via sweep_script.py's evaluation loop (sweep_script.py:51-176)."""
        import numpy as np

        from deeplabv3plus_augmented_superresolution_tpu.metrics import (
            compute_iou,
        )

        a = self.args
        ref = self.baselines["sweep"]["argmax_class8"]
        cfg = ref["config"]
        class_id = cfg["class_id"]
        n = 1 if a.smoke else cfg["num_samples"]
        overrides = {k: cfg[k] for k in
                     ("lambda_tv", "lambda_L2", "lambda_L1", "learning_rate",
                      "decay_steps", "decay_rate")}
        if not a.smoke:
            overrides["num_iter"] = cfg["num_iter"]
        paths = self._val_paths(class_id, n)
        th = _th_default("argmax")
        cols = ["aug_iou_single", "standard_iou_single", "aug_iou_multiple",
                "standard_iou_multiple", "max_iou", "mean_iou"]
        agg = {c: [] for c in cols}
        for i, p in enumerate(paths):
            img, gt = self._load_pair(p)
            out = self._asr_masks(img, class_id, "argmax", th, seed=SEED + i,
                                  sr_overrides=overrides)
            masks = {k: np.asarray(v) for k, v in out.items()}
            for c in cols:
                kind = c.split("_")[0]
                key = {"aug": "aug", "standard": "standard",
                       "max": "max", "mean": "mean"}[kind]
                agg[c].append(compute_iou(gt, masks[key], class_id=class_id,
                                          include_bg=c.endswith("multiple")))

        row = {"Name": "best_argmax_sweep", **{k: cfg[k] for k in
               ("lambda_tv", "lambda_L2", "lambda_L1", "learning_rate",
                "num_iter", "num_aug")}}
        row.update({c: float(np.nanmean(agg[c])) if agg[c] else float("nan")
                    for c in cols})
        out_csv = os.path.join(self.out_dir, "sweep_best_argmax.csv")
        with open(out_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row))
            w.writeheader()
            w.writerow(row)
        print(f"[sweep] wrote {out_csv} ({len(paths)} imgs)")

        tol = self.baselines["tolerances"]["sweep_iou"]
        for c in cols:
            self._compare("sweep/argmax_class8", c, row[c],
                          ref["aggregate_mean"].get(c), tol,
                          one_sided=not c.startswith("standard"))

    def run_robustness(self):
        import random as _random
        from functools import partial

        import jax
        import jax.numpy as jnp
        import numpy as np

        from deeplabv3plus_augmented_superresolution_tpu.data import (
            get_img_paths,
            load_image,
        )
        from deeplabv3plus_augmented_superresolution_tpu.metrics import mean_iou
        from deeplabv3plus_augmented_superresolution_tpu.models import (
            DeepLabConfig,
            build_model,
        )
        from deeplabv3plus_augmented_superresolution_tpu.ops.shear_warp import (
            paeth_rotate_translate,
        )

        a = self.args
        # full model (with final upsample) — separate from the SR model
        cfg = DeepLabConfig(input_shape=self.model_cfg.input_shape, classes=21,
                            os=16, backbone=a.backbone, final_upsample=True,
                            compute_dtype=self.model_cfg.compute_dtype)
        wp = a.weights_path
        if wp is None and not a.smoke:
            from deeplabv3plus_augmented_superresolution_tpu.models import (
                default_weights_path,
            )
            wp = default_weights_path(a.backbone)
            wp = wp if os.path.exists(wp) else None
        params, apply_fn = build_model(cfg, seed=0, weights_path=wp)

        if a.smoke:
            img_paths = self._val_paths(0, 1)
            angles = [0.0, 0.2]
            shift_vals = [0.0]
        else:
            paths = data_paths(use_validation=False, backbone=a.backbone)
            all_paths = get_img_paths(paths["image_list"], paths["imgs_path"],
                                      sort=True)
            rng = _random.Random(SEED)
            img_paths = rng.sample(all_paths,
                                   min(a.robustness_samples, len(all_paths)))
            if a.robustness_grid == "full":
                angles = [round(-0.7 + 0.05 * i, 4) for i in range(29)]
                shift_vals = list(np.linspace(-80, 80, 9))
            else:
                angles = [-0.7, -0.35, 0.0, 0.35, 0.7]
                shift_vals = [-80.0, 0.0, 80.0]

        images, gts = [], []
        for p in img_paths:
            images.append(load_image(p, image_size=self.img_size,
                                     normalize=True))
            gts.append(load_image(self._gt_path(p), image_size=self.img_size,
                                  normalize=False, is_png=True,
                                  resize_method="nearest"))
        images = jnp.asarray(np.stack(images))
        gts = jnp.asarray(np.stack(gts))
        angle_bound = max(max(abs(x) for x in angles) + 0.05, 1e-3)

        @partial(jax.jit)
        def combo_sums(imgs, gt, angle, sx, sy):
            n = imgs.shape[0]
            ang = jnp.full((n,), angle, jnp.float32)
            sh = jnp.broadcast_to(jnp.asarray([sx, sy], jnp.float32), (n, 2))
            aug = paeth_rotate_translate(imgs, ang, sh, angle_bound)
            gt_aug = paeth_rotate_translate(gt.astype(jnp.float32), ang, sh,
                                            angle_bound,
                                            interpolation="nearest")
            pred = jnp.argmax(apply_fn(params, aug), axis=-1)
            ious = jax.vmap(mean_iou)(gt_aug[..., 0], pred)
            valid = ~jnp.isnan(ious)
            return jnp.sum(jnp.where(valid, ious, 0.0)), jnp.sum(valid)

        batch = 16
        n_batches = -(-len(img_paths) // batch)
        out_csv = os.path.join(
            self.out_dir, f"robustness_{len(img_paths)}_class_all.csv")
        results = {}
        with open(out_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["Angle", "Shift_X", "Shift_Y", "mIoU"])
            for angle in angles:
                for sx in shift_vals:
                    for sy in shift_vals:
                        tot = cnt = 0.0
                        for b in range(n_batches):
                            sl = slice(b * batch, (b + 1) * batch)
                            s, c = combo_sums(images[sl], gts[sl],
                                              float(angle), float(sx),
                                              float(sy))
                            tot += float(s)
                            cnt += float(c)
                        miou = tot / cnt if cnt else float("nan")
                        results[(angle, sx, sy)] = miou
                        w.writerow([angle, sx, sy, round(miou, 4)])
                        f.flush()
        print(f"[robustness] wrote {out_csv}")

        ref = self.baselines["robustness"]
        tol = self.baselines["tolerances"]["robustness_identity_miou"]
        ident = results.get((0.0, 0.0, 0.0))
        self._compare("robustness", "identity_miou", ident,
                      ref["identity_miou"], tol, one_sided=True)
        vals = [v for v in results.values() if not math.isnan(v)]
        if vals and not self.args.smoke:
            self._compare("robustness", "grid_max_miou", max(vals),
                          ref["max_miou"], tol, one_sided=True)

    # -- comparison / report ------------------------------------------------

    def _compare(self, workload, name, ours, ref, tol, one_sided=False,
                 note=""):
        if self.args.smoke:
            # structural pass: the workload ran and produced a finite value
            ok = ours is not None
            note = (note + " smoke: structural check only").strip()
        elif ref is None:
            ok = True
            note = (note + " no reference baseline").strip()
        elif ours is None or math.isnan(ours):
            ok = False
            note = (note + " no finite result").strip()
        elif one_sided:
            ok = ours >= ref - tol  # better than the reference also passes
        else:
            ok = abs(ours - ref) <= tol
        self.rows.append((workload, name, ours, ref, tol, ok, note))

    def report(self):
        print()
        header = (f"{'workload':<22}{'metric':<26}{'ours':>9}{'ref':>9}"
                  f"{'tol':>7}  {'verdict':<8}note")
        print(header)
        print("-" * len(header))
        all_ok = True
        for wl, name, ours, ref, tol, ok, note in self.rows:
            all_ok &= ok
            o = "   --" if ours is None else f"{ours:9.4f}"
            r = "   --" if ref is None else f"{ref:9.4f}"
            print(f"{wl:<22}{name:<26}{o:>9}{r:>9}{tol:>7.3f}  "
                  f"{'PASS' if ok else 'FAIL':<8}{note}")
        print("-" * len(header))
        print(f"OVERALL: {'PASS' if all_ok else 'FAIL'}"
              + (" (smoke mode — structural checks only)" if self.args.smoke
                 else ""))
        return 0 if all_ok else 1


def main():
    args = parser.parse_args()

    if args.smoke:
        args.num_aug = 6
        args.num_iter = 5
        args.classes = args.classes or "8"
        args.threshold_class = 8
        args.modes = "argmax"
        args.backbone = "mobilenet"
    else:
        from deeplabv3plus_augmented_superresolution_tpu.models import (
            default_weights_path,
        )
        wp = args.weights_path or default_weights_path(args.backbone)
        if not os.path.exists(wp):
            raise SystemExit(
                f"No pretrained checkpoint at {wp}. Quality parity needs the "
                "bonlime weights (reference model.py:129-145); download them "
                "out-of-band, or run --smoke to exercise the harness.")
        paths = data_paths(use_validation=True, backbone=args.backbone)
        if not os.path.isdir(paths["imgs_path"]):
            raise SystemExit(
                f"No VOC tree at {paths['pascal_root']} — run "
                "cli/download_and_prepare_voc.py first (or --smoke).")

    h = Harness(args)
    workloads = [w.strip() for w in args.workloads.split(",") if w.strip()]
    for wl in workloads:
        if wl == "validation":
            for mode in args.modes.split(","):
                h.run_validation(mode.strip())
        elif wl == "threshold":
            h.run_threshold()
        elif wl == "sweep":
            h.run_sweep()
        elif wl == "robustness":
            h.run_robustness()
        else:
            raise SystemExit(f"unknown workload {wl!r}")
    sys.exit(h.report())


if __name__ == "__main__":
    main()
