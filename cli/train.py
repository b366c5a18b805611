"""Train DeepLabV3+ from scratch (or fine-tune a checkpoint) on TPU.

The reference never trains — its weights are downloaded pretrained (reference
model.py:129-145) and its training-era losses sit unused (reference
utils.py:41-91). This CLI is the framework's first-class training entry
point around models/train.py:

  * data: procedural synthetic scenes (data/synthetic.py — works in a
    zero-egress container) or a prepared PASCAL VOC tree
    (data/dataset.py, the reference's pascal_voc_dataset role) with
    host-side augmentation + threaded prefetch,
  * one jitted train step (bf16/f32 forward, batch-stats BN with EMA'd
    moving statistics, void-255-ignoring CE, optax) — optionally
    jax.checkpoint'd (--remat) for high-resolution batches,
  * data-parallel sharding over a device mesh (--devices N or --multihost;
    parallel.make_sharded_train_step: GSPMD gradient all-reduce +
    synchronized BatchNorm, no hand-written collectives),
  * device-resident synthetic dataset with lax.scan step chunks (one host
    round-trip per --log_every steps, not per step — the tunnel-latency
    pattern measured in NOTES.md),
  * periodic mIoU eval on a held-out set, full train-state .npz checkpoints
    every --ckpt_every steps (params + optimizer moments + schedule step,
    utils/checkpoint.py) that still drop into every CLI's --weights_path,
    and exact resume from any of them (interrupt-at-k + resume reproduces
    the uninterrupted loss trajectory — tests/test_training.py).

Examples:
    # synthetic scratch run on the default device
    python cli/train.py --steps 600 --size 128 --out train_run.json
    # 8-way data parallel on a mesh
    python cli/train.py --devices 8 --batch 16
    # fine-tune from a checkpoint on a VOC tree
    python cli/train.py --data voc --pascal_root data/dataset_root/VOCdevkit/VOC2012 \
        --resume ckpts/step_600.npz
"""

import argparse
import json
import os
import time

from _common import SEED  # noqa: F401  (sys.path + TPU env side effects)


def make_optimizer(args):
    import optax

    if args.lr_schedule == "constant":
        sched = args.lr
    elif args.lr_schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=args.lr,
            warmup_steps=args.warmup_steps,
            decay_steps=max(args.steps, args.warmup_steps + 1))
    elif args.lr_schedule == "exponential":
        # The reference's ExponentialDecay semantics (reference
        # optimizer.py:43-52): lr * rate^(step / decay_steps), staircase off.
        sched = optax.exponential_decay(
            init_value=args.lr, transition_steps=args.decay_steps,
            decay_rate=args.decay_rate, staircase=False)
    else:
        raise ValueError(args.lr_schedule)

    if args.optimizer == "adam":
        tx = optax.adam(sched)
    elif args.optimizer == "adamw":
        tx = optax.adamw(sched, weight_decay=args.weight_decay)
    elif args.optimizer == "sgd":
        tx = optax.sgd(sched, momentum=args.momentum, nesterov=True)
    else:
        raise ValueError(args.optimizer)
    if args.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(args.grad_clip), tx)
    return tx


def synthetic_eval_fn(args, model_cfg, eval_imgs, eval_labs):
    """mIoU of the inference-mode forward over a held-out array batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deeplabv3plus_augmented_superresolution_tpu.metrics import mean_iou
    from deeplabv3plus_augmented_superresolution_tpu.models import forward

    @jax.jit
    def predict(params, images):
        logits = forward(params, images, model_cfg)
        return jnp.argmax(logits, axis=-1)

    def evaluate(params):
        ious = []
        for start in range(0, eval_imgs.shape[0], args.batch):
            im = eval_imgs[start:start + args.batch]
            lb = eval_labs[start:start + args.batch]
            if im.shape[0] < args.batch:  # pad to the compiled batch shape
                pad = args.batch - im.shape[0]
                im = np.concatenate([im, np.zeros_like(im[:1]).repeat(pad, 0)])
            pred = np.asarray(predict(params, jnp.asarray(im)))[:lb.shape[0]]
            for t, p in zip(lb, pred):
                ious.append(float(mean_iou(t, p, model_cfg.classes)))
        return float(np.nanmean(ious))

    return evaluate


def main():
    ap = argparse.ArgumentParser(
        description="Train DeepLabV3+ (TPU-native; the reference has no "
                    "training path — weights were downloaded pretrained)")
    ap.add_argument("--data", default="synthetic", choices=["synthetic", "voc"])
    ap.add_argument("--pascal_root", default="",
                    help="prepared VOC tree (cli/download_and_prepare_voc.py)")
    ap.add_argument("--split", default="trainaug",
                    help="VOC split file (trainaug/valaug)")
    ap.add_argument("--augment", action="store_true",
                    help="host-side random_transform augmentation (VOC data)")
    ap.add_argument("--backbone", default="xception",
                    choices=["xception", "mobilenet"])
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--size", type=int, default=128,
                    help="training resolution (params are resolution-free; "
                         "evaluate/serve at any other size)")
    ap.add_argument("--classes", type=int, default=21)
    ap.add_argument("--compute_dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the forward (~2x forward FLOPs for "
                         "the activation memory; for high-res batches)")
    ap.add_argument("--warp_augment", action="store_true",
                    help="train on the TTA distribution: per-sample random "
                         "rotate+translate with zero fill, black borders "
                         "labeled background (pipeline.warp_augment_batch) "
                         "— makes the model robust to the warped copies "
                         "the ASR pipeline feeds it")
    ap.add_argument("--warp_angle_max", type=float, default=0.15)
    ap.add_argument("--warp_shift_max", type=float, default=-1.0,
                    help="-1 = scale the production 80px to --size")
    ap.add_argument("--skip_nonfinite", default=True,
                    action=argparse.BooleanOptionalAction,
                    help="atomically skip steps whose loss/grads are "
                         "non-finite (degenerate batches — e.g. all-constant "
                         "images — blow up BN's backward on TPU; see "
                         "models/train.py). --no-skip_nonfinite disables")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=8,
                    help="GLOBAL batch size (divides across the mesh)")
    ap.add_argument("--optimizer", default="adam",
                    choices=["adam", "adamw", "sgd"])
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lr_schedule", default="constant",
                    choices=["constant", "cosine", "exponential"])
    ap.add_argument("--warmup_steps", type=int, default=50)
    ap.add_argument("--decay_steps", type=int, default=200)
    ap.add_argument("--decay_rate", type=float, default=0.5)
    ap.add_argument("--weight_decay", type=float, default=1e-4)
    ap.add_argument("--momentum", type=float, default=0.9)
    ap.add_argument("--grad_clip", type=float, default=0.0)
    ap.add_argument("--bn_momentum", type=float, default=0.9)
    ap.add_argument("--devices", type=int, default=0,
                    help="data-parallel over the first N devices "
                         "(0 = single-device jit; requires N <= available)")
    ap.add_argument("--multihost", action="store_true",
                    help="jax.distributed.initialize + DCNxICI mesh over all "
                         "processes (JAX_COORDINATOR_ADDRESS et al.)")
    ap.add_argument("--train_set", type=int, default=128,
                    help="synthetic: number of generated training scenes")
    ap.add_argument("--hard", action="store_true",
                    help="synthetic: de-saturated hard-scene recipe "
                         "(data/synthetic.py hard=True — clutter, "
                         "distractors, occlusion, thin structures)")
    ap.add_argument("--class_ids", type=int, nargs="+", default=[8, 12],
                    help="synthetic: foreground class ids")
    ap.add_argument("--eval_every", type=int, default=0,
                    help="evaluate held-out mIoU every N steps (0 = only at "
                         "the end)")
    ap.add_argument("--eval_images", type=int, default=16)
    ap.add_argument("--log_every", type=int, default=50)
    ap.add_argument("--ckpt_dir", default="",
                    help="write step_<N> checkpoints here")
    ap.add_argument("--ckpt_every", type=int, default=200)
    ap.add_argument("--ckpt_format", default="npz", choices=["npz", "orbax"],
                    help="npz: one flat .npz per checkpoint (also valid as "
                         "any CLI's --weights_path). orbax: a step_<N>/ "
                         "checkpoint DIRECTORY per save via orbax's "
                         "StandardCheckpointer — arrays are written with "
                         "their shardings, so a --devices/--multihost run "
                         "saves the DISTRIBUTED train state without "
                         "gathering it to one host (each process writes its "
                         "own shards; utils/checkpoint.py)")
    ap.add_argument("--resume", default="",
                    help="checkpoint to start from. A --ckpt_dir train-state "
                         ".npz (or an orbax step_<N>/ directory) restores "
                         "params + optimizer moments + LR-schedule step and "
                         "continues the run exactly (--steps more steps "
                         "from there); a params-only .npz or .h5 warm-starts "
                         "params only")
    ap.add_argument("--save_params", default="trained_params.npz",
                    help="final params .npz ('' to skip)")
    ap.add_argument("--seed", type=int, default=SEED)
    ap.add_argument("--out", default="",
                    help="write the run summary as JSON")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from deeplabv3plus_augmented_superresolution_tpu.models import (
        DeepLabConfig, init_params, make_train_step, save_params_npz)
    from deeplabv3plus_augmented_superresolution_tpu.parallel import (
        initialize_distributed, make_mesh, make_multihost_mesh,
        make_sharded_train_step, shard_train_batch)

    if args.multihost:
        initialize_distributed()

    cfg = DeepLabConfig(
        input_shape=(args.size, args.size, 3), classes=args.classes,
        backbone=args.backbone, alpha=args.alpha, weights=None,
        final_upsample=True, compute_dtype=args.compute_dtype)
    params = init_params(cfg, seed=args.seed)
    resume_opt_leaves, start_step = None, 0
    orbax_resume = bool(args.resume) and os.path.isdir(args.resume)
    if args.resume and not orbax_resume:
        from deeplabv3plus_augmented_superresolution_tpu.models import (
            build_model)
        params, _ = build_model(cfg, params=params, weights_path=args.resume)
        if args.resume.endswith(".npz"):
            from deeplabv3plus_augmented_superresolution_tpu.utils import (
                load_train_state)
            resume_opt_leaves, start_step = load_train_state(args.resume)
        print(f"[train] resumed params from {args.resume}"
              + (f" at step {start_step} (full train state)"
                 if resume_opt_leaves is not None else " (params only)"))

    tx = make_optimizer(args)
    opt_state = tx.init(params)
    if resume_opt_leaves is not None:
        from deeplabv3plus_augmented_superresolution_tpu.utils import (
            restore_opt_state)
        try:
            opt_state = restore_opt_state(opt_state, resume_opt_leaves)
            print("[train] restored optimizer state (moments + schedule "
                  "position)")
        except ValueError as e:
            print(f"[train] WARNING: checkpoint optimizer state does not fit "
                  f"the requested optimizer ({e}); starting the optimizer "
                  f"fresh")
    if orbax_resume:
        # Orbax checkpoint directory: the full train-state pytree restores
        # against the freshly built (params, opt_state) template, so
        # structure/dtype mismatches fail loudly instead of mis-assigning.
        import numpy as np
        from deeplabv3plus_augmented_superresolution_tpu.utils import (
            restore_checkpoint)
        restored = restore_checkpoint(
            args.resume, template={"params": params, "opt_state": opt_state,
                                   "step": np.asarray(0)})
        params, opt_state = restored["params"], restored["opt_state"]
        start_step = int(restored["step"])
        print(f"[train] resumed orbax train state from {args.resume} "
              f"at step {start_step}")

    mesh = None
    if args.multihost:
        mesh = make_multihost_mesh()
    elif args.devices:
        mesh = make_mesh(jax.devices()[:args.devices])
    if mesh is not None:
        if args.batch % mesh.size:
            ap.error(f"--batch {args.batch} must divide the {mesh.size}-device"
                     " mesh")
        step = make_sharded_train_step(mesh, cfg, tx,
                                       bn_momentum=args.bn_momentum,
                                       remat=args.remat,
                                       skip_nonfinite=args.skip_nonfinite)
        print(f"[train] data-parallel over {mesh.size} devices "
              f"(mesh {dict(mesh.shape)})")
    else:
        step = make_train_step(cfg, tx, bn_momentum=args.bn_momentum,
                               remat=args.remat,
                               skip_nonfinite=args.skip_nonfinite)

    rng = np.random.default_rng(args.seed)
    losses, evals = [], {}
    t0 = time.time()

    shift_max = (args.warp_shift_max if args.warp_shift_max >= 0
                 else 80.0 * args.size / 512.0)

    def host_warp_augment(im, lb, seed):
        """Apply the on-device warp augmentation to a host batch (the
        streamed mesh/VOC paths; the synthetic scan path fuses it into the
        jitted chunk instead)."""
        if not args.warp_augment:
            return im, lb
        from deeplabv3plus_augmented_superresolution_tpu.pipeline import (
            warp_augment_batch)
        imj, lbj = warp_augment_batch(jax.random.key(seed),
                                      jnp.asarray(im),
                                      jnp.asarray(lb.astype(np.int32)),
                                      angle_max=args.warp_angle_max,
                                      shift_max=shift_max)
        return np.asarray(imj), np.asarray(lbj)

    def maybe_checkpoint(params, opt_state, done):
        if not (args.ckpt_dir and done % args.ckpt_every == 0):
            return
        if args.ckpt_format == "orbax":
            from deeplabv3plus_augmented_superresolution_tpu.utils import (
                save_checkpoint)
            path = os.path.join(args.ckpt_dir, f"step_{done}")
            # The arrays go to orbax WITH their shardings — a mesh run
            # writes the distributed train state shard-by-shard (no
            # gather-to-host), which is this format's reason to exist.
            save_checkpoint(path, {"params": params, "opt_state": opt_state,
                                   "step": np.asarray(done)})
            print(f"[train] orbax checkpoint -> {path}")
            return
        from deeplabv3plus_augmented_superresolution_tpu.utils import (
            save_train_state)
        os.makedirs(args.ckpt_dir, exist_ok=True)
        path = os.path.join(args.ckpt_dir, f"step_{done}.npz")
        # Full train state (params + optimizer moments + schedule step)
        # so --resume continues the interrupted run exactly; the file
        # stays --weights_path-compatible (extra keys are __-prefixed).
        save_train_state(path, jax.device_get(params),
                         jax.device_get(opt_state), done)
        print(f"[train] checkpoint -> {path}")

    total_steps = start_step + args.steps

    if args.data == "synthetic":
        from deeplabv3plus_augmented_superresolution_tpu.data.synthetic import (
            synthetic_batch)
        imgs, labs = synthetic_batch(rng, args.train_set,
                                     size=(args.size, args.size),
                                     class_ids=tuple(args.class_ids),
                                     hard=args.hard)
        eval_imgs, eval_labs = synthetic_batch(rng, args.eval_images,
                                               size=(args.size, args.size),
                                               class_ids=tuple(args.class_ids),
                                               hard=args.hard)
        evaluate = synthetic_eval_fn(args, cfg, eval_imgs, eval_labs)

        if mesh is None:
            # Device-resident dataset + lax.scan chunks: one host round-trip
            # per log interval (the tunnel-efficient path; NOTES.md I/O facts).
            ds_img = jnp.asarray((imgs * 255).astype(np.uint8))
            ds_lab = jnp.asarray(labs.astype(np.uint8))

            def train_chunk(params, opt_state, data_img, data_lab, keys):
                def body(carry, key):
                    p, o = carry
                    k_idx, k_aug = jax.random.split(key)
                    idx = jax.random.randint(k_idx, (args.batch,), 0,
                                             data_img.shape[0])
                    im = data_img[idx].astype(jnp.float32) / 255.0
                    lb = data_lab[idx].astype(jnp.int32)
                    if args.warp_augment:
                        from deeplabv3plus_augmented_superresolution_tpu.pipeline import (  # noqa: E501
                            warp_augment_batch)
                        im, lb = warp_augment_batch(
                            k_aug, im, lb, angle_max=args.warp_angle_max,
                            shift_max=shift_max)
                    p, o, loss = step(p, o, im, lb)
                    return (p, o), loss

                (params, opt_state), ls = jax.lax.scan(
                    body, (params, opt_state), keys)
                return params, opt_state, ls

            train_chunk = jax.jit(train_chunk, donate_argnums=(0, 1))
            key = jax.random.key(args.seed)
            done = start_step
            while done < total_steps:
                n = min(args.log_every, total_steps - done)
                keys = jax.random.split(jax.random.fold_in(key, done), n)
                params, opt_state, ls = train_chunk(params, opt_state,
                                                    ds_img, ds_lab, keys)
                losses.extend(np.asarray(ls, np.float32).tolist())
                done += n
                print(f"[train] step {done}/{total_steps} "
                      f"loss {losses[-1]:.4f}", flush=True)
                maybe_checkpoint(params, opt_state, done)
                if args.eval_every and done % args.eval_every == 0:
                    evals[done] = evaluate(params)
                    print(f"[train] step {done} held-out mIoU "
                          f"{evals[done]:.4f}")
        else:
            for done in range(start_step + 1, total_steps + 1):
                idx = rng.integers(0, imgs.shape[0], args.batch)
                im, lb = host_warp_augment(imgs[idx].astype(np.float32),
                                           labs[idx], args.seed + done)
                im, lb = shard_train_batch(mesh, im, lb.astype(np.int32))
                params, opt_state, loss = step(params, opt_state, im, lb)
                if done % args.log_every == 0 or done == total_steps:
                    losses.append(float(loss))
                    print(f"[train] step {done}/{total_steps} "
                          f"loss {losses[-1]:.4f}", flush=True)
                maybe_checkpoint(params, opt_state, done)
                if args.eval_every and done % args.eval_every == 0:
                    evals[done] = evaluate(params)
                    print(f"[train] step {done} held-out mIoU "
                          f"{evals[done]:.4f}")
        final_miou = evaluate(params)
    else:
        if not args.pascal_root:
            ap.error("--data voc requires --pascal_root")
        from deeplabv3plus_augmented_superresolution_tpu.data.dataset import (
            PascalVOC2012Dataset)
        ds = PascalVOC2012Dataset(args.pascal_root,
                                  image_size=(args.size, args.size))
        done = start_step
        while done < total_steps:
            for im, mk in ds.batches(args.split, args.batch, shuffle=True,
                                     seed=args.seed + done,
                                     augment=args.augment):
                lb = mk[..., 0].astype(np.int32)
                im, lb = host_warp_augment(im, lb, args.seed + done)
                lb = lb.astype(np.int32)
                if mesh is not None:
                    im, lb = shard_train_batch(mesh, im, lb)
                params, opt_state, loss = step(params, opt_state, im, lb)
                done += 1
                if done % args.log_every == 0:
                    losses.append(float(loss))
                    print(f"[train] step {done}/{total_steps} "
                          f"loss {losses[-1]:.4f}", flush=True)
                maybe_checkpoint(params, opt_state, done)
                if done >= total_steps:
                    break
        final_miou = None  # VOC eval: use cli/validate_parity.py on the ckpt

    train_s = time.time() - t0
    params = jax.device_get(params)
    if args.save_params:
        save_params_npz(params, args.save_params)
        print(f"[train] final params -> {args.save_params} "
              "(drop into any CLI's --weights_path)")

    summary = {
        "backbone": args.backbone, "size": args.size, "steps": args.steps,
        "start_step": start_step, "total_steps": total_steps,
        "global_batch": args.batch,
        "devices": (mesh.size if mesh is not None else 1),
        "optimizer": args.optimizer, "lr_schedule": args.lr_schedule,
        "remat": args.remat, "compute_dtype": args.compute_dtype,
        "loss_first": losses[0] if losses else None,
        "loss_final": losses[-1] if losses else None,
        "losses": losses,
        "train_s": round(train_s, 1),
        "steps_per_s": round(args.steps / train_s, 3),
        "held_out_miou": final_miou, "evals": evals,
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
