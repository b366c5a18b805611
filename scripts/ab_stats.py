"""Flagship hard-regime A/B with statistical teeth + the calibration curve.

Round-4's headline A/Bs (`experiments/quality_hard_*.json`) were n=20 with
no uncertainty quantification, and the aug-vs-standard margin's dependence
on checkpoint calibration (the soft150 arm measured -0.83 pt) was only
half-told. This script closes both (VERDICT r4 next #2):

  1. trains ONE DeepLabV3+ from scratch on hard synthetic scenes, saving
     checkpoints at calibration milestones (default 150/300/600/1200 steps
     — 150 is the soft-logit regime most like the reference's bonlime
     checkpoint, whose VOC mIoU is 0.68; 1200 the saturated one),
  2. evaluates EVERY milestone checkpoint on the SAME n>=50 held-out
     scenes (paired design: identical scenes + identical fixed TTA set),
     full production pipeline (512 px, 100 copies, argmax OPM, 300-iter
     aug SR + max/mean + standard; serving mode — quality-equal to strict,
     `quality_ab_tpu512.json`),
  3. reports, per milestone, a PAIRED BOOTSTRAP CI (default 10k resamples)
     on mean(aug - standard) and on the win rate — the margin-vs-
     calibration curve in one JSON.

The reference's comparison this instruments: aug 0.6841 vs standard 0.6751
(+0.9 pt) at bonlime calibration (reference
experiments_data/final_validations/argmax_validation_final.csv).

Usage (one v5e chip; ~15 min):
    python scripts/ab_stats.py --hard --out experiments/quality_hard_stats.json \
        --save_prefix /tmp/ckpt_hard
Warp-augmented arm:
    python scripts/ab_stats.py --hard --warp_augment ...
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


def paired_bootstrap(deltas, n_boot, rng, wins=None):
    """Percentile bootstrap CI for the mean of paired deltas (and optionally
    the win rate over the same resamples)."""
    import numpy as np

    deltas = np.asarray(deltas, np.float64)
    n = len(deltas)
    idx = rng.integers(0, n, size=(n_boot, n))
    boot_means = deltas[idx].mean(axis=1)
    out = {
        "mean": float(deltas.mean()),
        "ci95": [float(np.percentile(boot_means, 2.5)),
                 float(np.percentile(boot_means, 97.5))],
        "p_mean_le_0": float((boot_means <= 0).mean()),
        "n": n, "n_boot": n_boot,
    }
    if wins is not None:
        wins = np.asarray(wins, np.float64)
        boot_wins = wins[idx].mean(axis=1)
        out["win_rate"] = float(wins.mean())
        out["win_rate_ci95"] = [float(np.percentile(boot_wins, 2.5)),
                                float(np.percentile(boot_wins, 97.5))]
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--backbone", default="xception",
                    choices=["xception", "mobilenet"])
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--milestones", type=int, nargs="+",
                    default=[150, 300, 600, 1200],
                    help="training steps at which a checkpoint is saved and "
                         "evaluated (the calibration axis)")
    ap.add_argument("--train_batch", type=int, default=8)
    ap.add_argument("--train_set", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--eval_images", type=int, default=50)
    ap.add_argument("--num_aug", type=int, default=100)
    ap.add_argument("--num_iter", type=int, default=300)
    ap.add_argument("--class_id", type=int, default=8)
    ap.add_argument("--th_factor", type=float, default=0.65)
    ap.add_argument("--mode", default="argmax",
                    choices=["argmax", "slice", "slice_max"])
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--bootstrap", type=int, default=10000)
    ap.add_argument("--hard", action="store_true")
    ap.add_argument("--warp_augment", action="store_true")
    ap.add_argument("--save_prefix", default="",
                    help="save milestone params as <prefix>_s<step>.npz")
    ap.add_argument("--load_prefix", default="",
                    help="skip training; load <prefix>_s<step>.npz per "
                         "milestone (same seed => identical eval scenes)")
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--quick", action="store_true",
                    help="tiny CPU configuration (CI)")
    ap.add_argument("--out", default="quality_stats.json")
    if "--quick" in sys.argv:
        ap.set_defaults(backbone="mobilenet", size=96, milestones=[20, 40],
                        train_batch=4, train_set=16, lr=3e-3, eval_images=4,
                        num_aug=8, num_iter=20, bootstrap=200,
                        compute_dtype="float32")
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
        asr_step,
        sample_augmentations,
    )
    from deeplabv3plus_augmented_superresolution_tpu.sr import (
        OptimizerConfig,
        SRConfig,
        precompute_gram_stencil,
    )

    rng = np.random.default_rng(args.seed)
    size = args.size
    class_ids = (args.class_id, 12 if args.class_id != 12 else 15)
    milestones = sorted(set(args.milestones))
    alpha = 0.35 if args.quick else 1.0

    train_cfg = DeepLabConfig(
        input_shape=(size, size, 3), classes=21, backbone=args.backbone,
        alpha=alpha, weights=None, final_upsample=True,
        compute_dtype=args.compute_dtype)

    # The train-scene draw must happen (even under --load_prefix) so the rng
    # stream — and therefore the held-out eval scenes — is identical between
    # the run that trained the checkpoints and any rerun reusing them.
    print(f"[ab_stats] generating {args.train_set} training scenes "
          f"(hard={args.hard})", flush=True)
    imgs, labs = synthetic_batch(rng, args.train_set, size=(size, size),
                                 class_ids=class_ids, hard=args.hard)

    ckpts = {}  # step -> params
    loss_at = {}
    if args.load_prefix:
        base = init_params(train_cfg, seed=0)
        for m in milestones:
            path = f"{args.load_prefix}_s{m}.npz"
            ckpts[m], _ = build_model(train_cfg, params=base,
                                      weights_path=path)
            print(f"[ab_stats] loaded {path}")
        train_s = 0.0
    else:
        params = init_params(train_cfg, seed=0)
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
        print("[ab_stats] scenes on device; compiling the train chunk "
              "(the 512-px program takes ~10-12 min through the tunnel)",
              flush=True)
        t0 = time.time()
        done = 0
        for m in milestones:
            while done < m:
                n = min(50, m - done)
                keys = jax.random.split(jax.random.fold_in(key, done), n)
                params, opt_state, losses = train_chunk(
                    params, opt_state, ds_img, ds_lab, keys)
                done += n
            loss_at[m] = float(np.asarray(losses)[-1])
            # Snapshot with fresh buffers: train_chunk donates its params
            # args, so the NEXT chunk call would delete these arrays.
            ckpts[m] = jax.tree.map(jnp.copy, params)
            print(f"[ab_stats] milestone {m}: loss {loss_at[m]:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
            if args.save_prefix:
                save_params_npz(jax.device_get(params),
                                f"{args.save_prefix}_s{m}.npz")
        train_s = time.time() - t0

    # ---- paired eval: same scenes + same fixed TTA for every checkpoint ---
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
    eval_imgs, eval_labs = synthetic_batch(
        rng, args.eval_images, size=(size, size), class_ids=class_ids,
        require_class=args.class_id, hard=args.hard)

    fixed = sample_augmentations(jax.random.key(args.seed), args.num_aug,
                                 0.15, shift_max)
    gram_coeffs = jax.jit(precompute_gram_stencil,
                          static_argnames=("cfg",))(*fixed, sr_cfg)

    arms = ("aug", "max", "mean", "standard")
    boot_rng = np.random.default_rng(args.seed + 7)
    curve = {}
    for m in milestones:
        per_scene = {a: [] for a in arms}
        t0 = time.time()
        for i in range(args.eval_images):
            out = asr_step(ckpts[m], jnp.asarray(eval_imgs[i]), *fixed,
                           model_cfg, sr_cfg, class_id=args.class_id,
                           mode=args.mode, th_factor=args.th_factor,
                           gram_coeffs=gram_coeffs)
            for a in arms:
                per_scene[a].append(float(single_class_iou(
                    eval_labs[i], out[a], args.class_id)))
        eval_s = time.time() - t0

        deltas = [a - s for a, s in zip(per_scene["aug"],
                                        per_scene["standard"])]
        wins = [float(d >= 0) for d in deltas]
        stats = paired_bootstrap(deltas, args.bootstrap, boot_rng, wins=wins)
        curve[m] = {
            "train_loss": loss_at.get(m),
            "iou": {a: round(float(np.mean(per_scene[a])), 4) for a in arms},
            "aug_minus_standard": stats,
            "eval_s": round(eval_s, 1),
        }
        print(f"[ab_stats] ckpt@{m}: aug {curve[m]['iou']['aug']:.4f} vs "
              f"standard {curve[m]['iou']['standard']:.4f} "
              f"(delta {stats['mean']:+.4f}, 95% CI "
              f"[{stats['ci95'][0]:+.4f}, {stats['ci95'][1]:+.4f}], "
              f"win {stats['win_rate']:.0%} "
              f"CI [{stats['win_rate_ci95'][0]:.0%}, "
              f"{stats['win_rate_ci95'][1]:.0%}])", flush=True)

    flagship = milestones[-1]
    result = {
        "backbone": args.backbone, "size": size, "mode": args.mode,
        "hard_scenes": args.hard, "warp_augment": args.warp_augment,
        "train_set": args.train_set, "lr": args.lr,
        "train_s": round(train_s, 1),
        "eval_images": args.eval_images, "num_aug": args.num_aug,
        "num_iter": args.num_iter, "th_factor": args.th_factor,
        "seed": args.seed, "bootstrap": args.bootstrap,
        "serving": True, "paired_design": ("identical scenes + identical "
                                           "fixed TTA set for every "
                                           "checkpoint"),
        "milestones": milestones,
        "flagship_step": flagship,
        "calibration_curve": {str(m): curve[m] for m in milestones},
        "flagship": curve[flagship],
        "reference_published": {"aug": 0.6841, "standard": 0.6751,
                                "delta": 0.009,
                                "source": "argmax_validation_final.csv "
                                          "(VOC + bonlime, mIoU 0.68 "
                                          "calibration)"},
    }

    def sanitize(x):
        if isinstance(x, float) and not (x == x and abs(x) != float("inf")):
            return None
        if isinstance(x, dict):
            return {k: sanitize(v) for k, v in x.items()}
        if isinstance(x, list):
            return [sanitize(v) for v in x]
        return x

    with open(args.out, "w") as f:
        json.dump(sanitize(result), f, indent=2, allow_nan=False)
    print(f"[ab_stats] -> {args.out}")


if __name__ == "__main__":
    main()
