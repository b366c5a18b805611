"""Fused warp+downsample operator vs the staged reference composition."""

import numpy as np

import jax
import jax.numpy as jnp

from deeplabv3plus_augmented_superresolution_tpu.metrics import single_class_iou
from deeplabv3plus_augmented_superresolution_tpu.ops.fused_operator import (
    fused_warp_downsample,
)
from deeplabv3plus_augmented_superresolution_tpu.ops.resize import resize
from deeplabv3plus_augmented_superresolution_tpu.ops.shear_warp import (
    paeth_rotate_translate,
)
from deeplabv3plus_augmented_superresolution_tpu.sr import (
    OptimizerConfig,
    SRConfig,
    augmented_superresolution,
    forward_operator,
    threshold_image,
)


def _smooth(h=128, seed=0):
    rng = np.random.default_rng(seed)
    low = rng.uniform(0, 1, (1, h // 16, h // 16, 1)).astype(np.float32)
    return np.asarray(resize(low, (h, h)))


def test_fused_matches_staged_shear_composition():
    """Fused op == paeth warp then TF resize (same single-resample warp),
    up to the tiny pass-C coordinate approximation."""
    img = _smooth(128, 0)
    n = 6
    rng = np.random.default_rng(1)
    angles = rng.uniform(-0.25, 0.25, n).astype(np.float32)
    shifts = rng.uniform(-15, 15, (n, 2)).astype(np.float32)

    fused = np.asarray(fused_warp_downsample(jnp.asarray(img), jnp.asarray(angles),
                                             jnp.asarray(shifts), (32, 32), 0.3))
    big = jnp.broadcast_to(jnp.asarray(img), (n, 128, 128, 1))
    staged = np.asarray(resize(paeth_rotate_translate(big, jnp.asarray(angles),
                                                      jnp.asarray(shifts), 0.3),
                               (32, 32)))
    err = np.abs(fused - staged)
    # interior (decimated coords; edges differ by fill handling)
    c = (slice(None), slice(6, 26), slice(6, 26), slice(None))
    assert err[c].max() < 0.06, err[c].max()
    assert err[c].mean() < 0.01, err[c].mean()


def test_fused_matches_staged_at_production_extremes():
    """Regression for the pass-B shift clip bug: at 512 px / angle_max 0.5 /
    shifts +-80 the composed pass-B offsets reach ~+170 px; the old clip
    (`_PAD - span - 8`, with span_b=249) clamped every positive shift to -1,
    silently corrupting the production forward operator for copies with large
    positive angles. Covers large POSITIVE and negative angle/shift copies."""
    img = _smooth(512, 4)
    angles = np.asarray([0.0, 0.45, -0.45, 0.49, 0.30, -0.30], np.float32)
    shifts = np.asarray([[0, 0], [78, 75], [-78, -75], [80, -80],
                         [-60, 70], [55, -65]], np.float32)

    fused = np.asarray(fused_warp_downsample(
        jnp.asarray(img), jnp.asarray(angles), jnp.asarray(shifts),
        (128, 128), 0.5))
    big = jnp.broadcast_to(jnp.asarray(img), (6, 512, 512, 1))
    staged = np.asarray(resize(paeth_rotate_translate(
        big, jnp.asarray(angles), jnp.asarray(shifts), 0.5), (128, 128)))
    err = np.abs(fused - staged)
    # interior decimated coords; edges differ by fill handling
    c = (slice(None), slice(16, 112), slice(16, 112), slice(None))
    assert err[c].max() < 0.06, err[c].max()
    assert err[c].mean() < 0.01, err[c].mean()


def test_fused_identity_copy_matches_plain_resize():
    img = _smooth(128, 2)
    fused = np.asarray(fused_warp_downsample(
        jnp.asarray(img), jnp.zeros(1), jnp.zeros((1, 2)), (32, 32), 0.3))
    plain = np.asarray(resize(jnp.asarray(img), (32, 32)))
    np.testing.assert_allclose(fused[0], plain[0], atol=1e-4)


def test_fused_operator_sr_recovery():
    """Solve with the fused operator against observations from the exact
    reference operator (gather warp + TF resize): recovery must match the
    staged-solve quality."""
    hr, lr, n = 64, 16, 24
    rng = np.random.default_rng(0)
    gt = np.zeros((hr, hr, 1), np.float32)
    gt[20:44, 16:48] = 1.0
    angles = rng.uniform(-0.25, 0.25, n).astype(np.float32)
    shifts = rng.uniform(-6, 6, (n, 2)).astype(np.float32)
    angles[0] = 0.0
    shifts[0] = 0.0
    masks = forward_operator(jnp.asarray(gt)[None], jnp.asarray(angles),
                             jnp.asarray(shifts), (lr, lr))  # gather reference

    cfg = SRConfig(lambda_df=1.0, lambda_tv=0.05, lambda_L2=0.01,
                   num_iter=150, num_aug=n, feature_size=(lr, lr),
                   output_size=(hr, hr), operator_impl="fused", angle_max=0.3,
                   optimizer=OptimizerConfig(learning_rate=5e-2, amsgrad=True))
    est, _ = augmented_superresolution(masks, jnp.asarray(angles),
                                       jnp.asarray(shifts), cfg)
    est_mask = np.asarray(threshold_image(est, 8, th_factor=0.5))
    iou = float(single_class_iou((gt[..., 0] * 8).astype(np.int32),
                                 est_mask[..., 0], 8))
    assert iou > 0.88, f"fused-operator recovery IoU {iou}"


def test_fused_operator_is_differentiable():
    img = jnp.asarray(_smooth(64, 3))
    angles = jnp.asarray([0.1, -0.2])
    shifts = jnp.asarray([[3.0, -2.0], [1.0, 4.0]])

    def loss(x):
        return jnp.sum(fused_warp_downsample(x, angles, shifts, (16, 16), 0.3) ** 2)

    g = np.asarray(jax.grad(loss)(img))
    assert np.isfinite(g).all() and np.abs(g).sum() > 0
