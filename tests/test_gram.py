"""Gram-stencil solver: exactness vs the direct data-term and solve parity."""

import numpy as np

import jax
import jax.numpy as jnp

from deeplabv3plus_augmented_superresolution_tpu.ops.gram import (
    RADIUS_X,
    RADIUS_Y,
    apply_gram,
    extract_gram_stencil,
    extract_gram_stencil_aliased,
)
from deeplabv3plus_augmented_superresolution_tpu.sr import (
    OptimizerConfig,
    SRConfig,
    augmented_superresolution,
    forward_operator,
)


def _setup(hr=64, lr=16, n=8, seed=0):
    rng = np.random.default_rng(seed)
    angles = rng.uniform(-0.25, 0.25, n).astype(np.float32)
    shifts = rng.uniform(-6, 6, (n, 2)).astype(np.float32)
    angles[0] = 0.0
    shifts[0] = 0.0
    cfg = SRConfig(num_aug=n, feature_size=(lr, lr), output_size=(hr, hr),
                   angle_max=0.3, num_iter=60,
                   optimizer=OptimizerConfig(learning_rate=2e-2, amsgrad=True))
    return cfg, jnp.asarray(angles), jnp.asarray(shifts), rng


def test_stencil_matches_direct_normal_operator():
    """apply_gram(x) == A^T A x exactly (support fits the static radii)."""
    cfg, angles, shifts, rng = _setup()

    def fwd(z):
        return forward_operator(z, angles, shifts, cfg.feature_size, cfg)

    def normal_op(x):
        out, vjp = jax.vjp(fwd, x)
        return vjp(out)[0]

    coeffs = extract_gram_stencil(normal_op, cfg.output_size)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32))
    direct = np.asarray(normal_op(x))
    via_stencil = np.asarray(apply_gram(x, coeffs))
    np.testing.assert_allclose(via_stencil, direct, rtol=2e-4, atol=2e-4)


import pytest


@pytest.mark.parametrize("operator_impl,tol", [
    ("staged", 1e-5),   # shear passes + resize matmuls: shallowest chains
    ("fused", 5e-5),    # decimation matmuls inside the chain: deeper f32
])
def test_stencil_exact_at_production_shape(operator_impl, tol):
    """512x512 / angle_max 0.5 / shifts +-80 — the CLI default configuration
    (cli/_common.py) and the worst case for the static stencil radii
    (RADIUS_Y/X) and the shear _PAD clipping. Uses extreme corner angles and
    shifts rather than random draws to stress the support bound. Covers both
    the staged and the production fused operator."""
    angles = jnp.asarray([0.5, -0.5, 0.49, -0.32, 0.11, 0.0], jnp.float32)
    shifts = jnp.asarray([[80, -80], [-80, 80], [79, 79], [-45, 60],
                          [12, -70], [0, 0]], jnp.float32)
    cfg = SRConfig(num_aug=6, feature_size=(128, 128), output_size=(512, 512),
                   angle_max=0.5, num_iter=10, operator_impl=operator_impl,
                   optimizer=OptimizerConfig(learning_rate=1e-2))

    def fwd(z):
        return forward_operator(z, angles, shifts, cfg.feature_size, cfg)

    def normal_op(x):
        out, vjp = jax.vjp(fwd, x)
        return vjp(out)[0]

    coeffs = extract_gram_stencil(normal_op, cfg.output_size)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 512, 512, 1)).astype(np.float32))
    direct = np.asarray(normal_op(x))
    via = np.asarray(apply_gram(x, coeffs))
    scale = np.abs(direct).max()
    np.testing.assert_allclose(via, direct, atol=tol * scale)

    # The production extraction scheme (35 aliased probes + symmetry
    # disentangling) must produce the same coefficients at this worst-case
    # shape, including the edge chains where the recurrence terminates.
    # Tolerance: the disentangling is exact in exact arithmetic; in f32 the
    # reverse cumulative sums accumulate ~1e-5 absolute error over their
    # 512/5-term chains (verified: errors grow right-to-left with chain
    # length and the unaliased dx=0 channel matches bitwise).
    aliased = np.asarray(extract_gram_stencil_aliased(normal_op,
                                                      cfg.output_size))
    cscale = np.abs(np.asarray(coeffs)).max()
    np.testing.assert_allclose(aliased, np.asarray(coeffs),
                               atol=2e-4 * cscale)
    via_a = np.asarray(apply_gram(x, jnp.asarray(aliased)))
    np.testing.assert_allclose(via_a, direct, atol=(tol + 2e-4) * scale)


def test_aliased_extraction_matches_dense():
    """extract_gram_stencil_aliased == extract_gram_stencil coefficient-for-
    coefficient (the aliased scheme is exact, not approximate)."""
    cfg, angles, shifts, rng = _setup(hr=64, lr=16, n=6, seed=4)

    def fwd(z):
        return forward_operator(z, angles, shifts, cfg.feature_size, cfg)

    def normal_op(x):
        out, vjp = jax.vjp(fwd, x)
        return vjp(out)[0]

    dense = np.asarray(extract_gram_stencil(normal_op, cfg.output_size))
    aliased = np.asarray(extract_gram_stencil_aliased(normal_op,
                                                      cfg.output_size))
    np.testing.assert_allclose(aliased, dense, atol=1e-5 * np.abs(dense).max())


def test_gram_solve_matches_direct_solve():
    """The gram solver follows the same optimization trajectory as the direct
    solver (identical objective and gradients up to float reassociation)."""
    import dataclasses

    cfg, angles, shifts, rng = _setup()
    masks = forward_operator(
        jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32)),
        angles, shifts, cfg.feature_size, cfg)

    direct, loss_d = augmented_superresolution(masks, angles, shifts, cfg)
    gram_cfg = dataclasses.replace(cfg, solver_impl="gram")
    gram, loss_g = augmented_superresolution(masks, angles, shifts, gram_cfg)

    np.testing.assert_allclose(float(loss_g), float(loss_d), rtol=1e-3)
    # The ~5e-5 stencil extraction error is amplified through 60 chaotic-ish
    # Adam steps; 1e-2 on [0,1]-valued targets is far below mask relevance.
    np.testing.assert_allclose(np.asarray(gram), np.asarray(direct),
                               atol=1.5e-2)


def test_cg_solver_matches_adam_quality_at_3x_fewer_iterations():
    """IRLS-CG on the Gram system (solver_impl="cg", 6x15 = 90 stencil
    applies) must reach an equal-or-lower TRUE objective than 300 Adam-gram
    steps, with the same recovered mask."""
    import dataclasses

    from deeplabv3plus_augmented_superresolution_tpu.metrics import (
        single_class_iou,
    )
    from deeplabv3plus_augmented_superresolution_tpu.sr.postprocess import (
        threshold_image,
    )

    hr, lr, n = 64, 16, 24
    rng = np.random.default_rng(0)
    gt = np.zeros((hr, hr, 1), np.float32)
    gt[20:44, 16:48] = 1.0
    angles = rng.uniform(-0.25, 0.25, n).astype(np.float32)
    shifts = rng.uniform(-6, 6, (n, 2)).astype(np.float32)
    angles[0] = 0.0
    shifts[0] = 0.0
    angles, shifts = jnp.asarray(angles), jnp.asarray(shifts)
    cfg = SRConfig(lambda_df=1.0, lambda_tv=0.05, lambda_L2=0.01, num_iter=300,
                   num_aug=n, feature_size=(lr, lr), output_size=(hr, hr),
                   angle_max=0.3, solver_impl="gram",
                   optimizer=OptimizerConfig(learning_rate=5e-2, amsgrad=True))
    masks = forward_operator(jnp.asarray(gt)[None], angles, shifts, (lr, lr),
                             cfg)

    def iou_of(est):
        m = np.asarray(threshold_image(est, 8, th_factor=0.5))
        return float(single_class_iou((gt[..., 0] * 8).astype(np.int32),
                                      m[..., 0], 8))

    est_adam, loss_adam = augmented_superresolution(masks, angles, shifts, cfg)
    cg_cfg = dataclasses.replace(cfg, solver_impl="cg")
    est_cg, loss_cg = augmented_superresolution(masks, angles, shifts, cg_cfg)

    assert float(loss_cg) <= float(loss_adam) * 1.001, (
        f"cg loss {float(loss_cg)} vs adam {float(loss_adam)}")
    assert iou_of(est_cg) >= iou_of(est_adam) - 1e-6


def test_default_solver_robust_to_model_garbage_votes():
    """Why gram+Adam (the reference trajectory) is the production default
    and IRLS-CG is opt-in (run_asr round-3 revert; NOTES.md "CG
    investigation").

    Real model masks of warped TTA copies contain structured false
    positives — a brittle model mislabels parts of the warped content
    (measured on-chip: 28% of valid pixels claim the class vs 8.3% true).
    The SR objective's TRUE minimizer then fits the garbage-vote average,
    raising the background toward (votes/copies) and collapsing
    max-relative thresholding at th_factor 0.2; 300-step lr-decayed Adam
    (the reference's solver, its lr decays to ~2.4e-6 — it never converges)
    acts as implicit regularization and keeps thresholded quality.

    This test reproduces that regime CPU-sized: consistent binarized
    observations plus per-copy false-positive blobs. It pins
    (a) the production default stays quality-robust, and (b) the trade-off
    is real — CG reaches a LOWER objective yet a far WORSE mask, so
    "better optimizer" must never be the only promotion criterion again.
    """
    import dataclasses

    from deeplabv3plus_augmented_superresolution_tpu.metrics import (
        single_class_iou,
    )
    from deeplabv3plus_augmented_superresolution_tpu.sr.postprocess import (
        threshold_image,
    )

    hr, lr, n = 64, 16, 16
    rng = np.random.default_rng(3)
    angles = rng.uniform(-0.14, 0.14, n).astype(np.float32)
    shifts = rng.uniform(-8, 8, (n, 2)).astype(np.float32)
    angles[0] = 0.0
    shifts[0] = 0.0
    angles, shifts = jnp.asarray(angles), jnp.asarray(shifts)
    yy, xx = np.mgrid[0:hr, 0:hr]
    gt = ((((yy - 30) / 14.0) ** 2 + ((xx - 34) / 18.0) ** 2) <= 1.0
          ).astype(np.float32)

    def mk(solver):
        # Production lambdas + the reference's exact optimizer config
        # (lr 1e-3, amsgrad, ExponentialDecay 60/0.3 — SR_single_class.py).
        return SRConfig(lambda_df=1.0, lambda_tv=0.3, lambda_L2=0.7,
                        num_iter=300, num_aug=n, feature_size=(lr, lr),
                        output_size=(hr, hr), angle_max=0.16,
                        solver_impl=solver,
                        optimizer=OptimizerConfig(
                            learning_rate=1e-3, amsgrad=True,
                            lr_scheduler=True, decay_steps=60,
                            decay_rate=0.3))

    obs = np.asarray(forward_operator(jnp.asarray(gt)[None, ..., None]
                                      .repeat(n, 0), angles, shifts,
                                      (lr, lr), mk("gram")))
    obs = (obs > 0.5).astype(np.float32)  # argmax-like binary LR masks
    for i in range(1, n):  # per-copy false-positive blobs (~15% of frame)
        r = np.random.default_rng(100 + i)
        for _ in range(3):
            cy, cx = r.uniform(2, 14, 2)
            rad = r.uniform(2.0, 3.5)
            by, bx = np.mgrid[0:lr, 0:lr]
            blob = ((by - cy) ** 2 + (bx - cx) ** 2) <= rad ** 2
            obs[i, ..., 0] = np.maximum(obs[i, ..., 0],
                                        blob.astype(np.float32))
    obs = jnp.asarray(obs)
    gt_lab = (gt * 8).astype(np.int32)

    def solve(solver):
        est, loss = augmented_superresolution(obs, angles, shifts, mk(solver))
        mask = np.asarray(threshold_image(est, 8, th_factor=0.2))
        return (float(single_class_iou(gt_lab, mask[..., 0], 8)),
                float(loss), float(np.median(np.asarray(est))))

    iou_gram, loss_gram, med_gram = solve("gram")
    iou_cg, loss_cg, med_cg = solve("cg")
    # (a) the production default survives garbage votes at th 0.2
    assert iou_gram > 0.8, (iou_gram, med_gram)
    assert med_gram < 0.05
    # (b) the trade-off this test documents: CG minimizes better and masks
    # worse. If CG ever passes the gram bar here, the default choice should
    # be revisited — loosen these two asserts, don't chase them.
    assert loss_cg < loss_gram
    assert iou_cg < iou_gram - 0.2, (iou_cg, iou_gram)


def test_precomputed_stencil_solve_matches_inline_extraction():
    """Passing precompute_gram_stencil's coefficients into the solve must
    reproduce the inline-extraction gram solve exactly (serving-mode path)."""
    import dataclasses

    from deeplabv3plus_augmented_superresolution_tpu.sr import (
        precompute_gram_stencil,
    )

    cfg, angles, shifts, rng = _setup()
    cfg = dataclasses.replace(cfg, solver_impl="gram")
    masks = forward_operator(
        jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32)),
        angles, shifts, cfg.feature_size, cfg)

    inline, loss_i = augmented_superresolution(masks, angles, shifts, cfg)
    coeffs = precompute_gram_stencil(angles, shifts, cfg)
    shared, loss_s = augmented_superresolution(masks, angles, shifts, cfg,
                                               gram_coeffs=coeffs)
    np.testing.assert_allclose(np.asarray(shared), np.asarray(inline),
                               atol=1e-6)
    np.testing.assert_allclose(float(loss_s), float(loss_i), rtol=1e-6)


def test_shared_tta_set_quality_equivalent():
    """A single fixed augmentation set reused across images recovers masks as
    well as per-image random sets (the run_asr serving default). Checked on
    the synthetic-recovery suite over several distinct ground truths."""
    import dataclasses

    from deeplabv3plus_augmented_superresolution_tpu.sr import (
        precompute_gram_stencil,
    )
    from deeplabv3plus_augmented_superresolution_tpu.sr.postprocess import (
        threshold_image,
    )
    from deeplabv3plus_augmented_superresolution_tpu.metrics import (
        single_class_iou,
    )

    hr, lr, n = 64, 16, 24
    base_cfg = SRConfig(lambda_df=1.0, lambda_tv=0.05, lambda_L2=0.01,
                        num_iter=150, num_aug=n, feature_size=(lr, lr),
                        output_size=(hr, hr), angle_max=0.3,
                        solver_impl="gram",
                        optimizer=OptimizerConfig(learning_rate=5e-2,
                                                  amsgrad=True))

    def gts():
        shapes = [((18, 44), (14, 50)), ((8, 30), (26, 58)), ((30, 56), (6, 34))]
        for (y0, y1), (x0, x1) in shapes:
            gt = np.zeros((hr, hr, 1), np.float32)
            gt[y0:y1, x0:x1] = 1.0
            yield gt

    def solve_iou(gt, angles, shifts, coeffs=None):
        masks = forward_operator(jnp.asarray(gt)[None], angles, shifts,
                                 (lr, lr), base_cfg)
        est, _ = augmented_superresolution(masks, angles, shifts, base_cfg,
                                           gram_coeffs=coeffs)
        est_mask = np.asarray(threshold_image(est, 8, th_factor=0.5))
        gt_mask = (gt[..., 0] * 8).astype(np.int32)
        return float(single_class_iou(gt_mask, est_mask[..., 0], 8))

    rng = np.random.default_rng(0)

    def draw(seed):
        r = np.random.default_rng(seed)
        a = r.uniform(-0.25, 0.25, n).astype(np.float32)
        s = r.uniform(-6, 6, (n, 2)).astype(np.float32)
        a[0] = 0.0
        s[0] = 0.0
        return jnp.asarray(a), jnp.asarray(s)

    a_shared, s_shared = draw(123)
    coeffs = precompute_gram_stencil(a_shared, s_shared, base_cfg)

    shared_ious, fresh_ious = [], []
    for i, gt in enumerate(gts()):
        shared_ious.append(solve_iou(gt, a_shared, s_shared, coeffs))
        a_i, s_i = draw(1000 + i)
        fresh_ious.append(solve_iou(gt, a_i, s_i))

    assert min(shared_ious) > 0.9, shared_ious
    assert abs(np.mean(shared_ious) - np.mean(fresh_ious)) < 0.03, (
        shared_ious, fresh_ious)


def test_gram_solve_with_copy_dropout():
    import dataclasses

    cfg, angles, shifts, rng = _setup()
    cfg = dataclasses.replace(cfg, copy_dropout=0.25)
    masks = forward_operator(
        jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32)),
        angles, shifts, cfg.feature_size, cfg)
    key = jax.random.key(3)
    direct, loss_d = augmented_superresolution(masks, angles, shifts, cfg,
                                               dropout_key=key)
    gram_cfg = dataclasses.replace(cfg, solver_impl="gram")
    gram, loss_g = augmented_superresolution(masks, angles, shifts, gram_cfg,
                                             dropout_key=key)
    np.testing.assert_allclose(float(loss_g), float(loss_d), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gram), np.asarray(direct), atol=2e-2)
