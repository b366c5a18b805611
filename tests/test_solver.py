"""SR loss/solver tests: TF-golden loss parity, optimizer parity, recovery."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deeplabv3plus_augmented_superresolution_tpu.sr import (
    OptimizerConfig,
    SRConfig,
    augmented_superresolution,
    forward_operator,
    make_optimizer,
    make_schedule,
    max_superresolution,
    mean_superresolution,
    sr_loss,
    threshold_image,
)
from deeplabv3plus_augmented_superresolution_tpu.metrics import single_class_iou
from deeplabv3plus_augmented_superresolution_tpu.ops.warp import (
    rotation_transform,
    translation_transform,
)

tf = pytest.importorskip("tensorflow")


def _tf_warp(images, transforms, interpolation="BILINEAR"):
    return tf.raw_ops.ImageProjectiveTransformV3(
        images=images, transforms=transforms,
        output_shape=tf.constant(images.shape[1:3], tf.int32),
        fill_value=tf.constant(0.0), interpolation=interpolation,
        fill_mode="CONSTANT")


def _tf_reference_loss(target, lr_masks, angles, shifts, lam_df, lam_tv,
                       lam_l2, lam_l1, feature_size):
    """The reference loss (superresolution.py:44-100) rebuilt from TF raw ops
    as an independent golden."""
    target = tf.constant(target)
    n = lr_masks.shape[0]
    batched = tf.tile(target, [n, 1, 1, 1])
    h, w = target.shape[1:3]
    rot = _tf_warp(batched, np.asarray(rotation_transform(angles, h, w)))
    aug = _tf_warp(rot, np.asarray(translation_transform(shifts)))
    d = tf.image.resize(aug, feature_size)
    df = tf.reduce_sum(tf.math.squared_difference(d, lr_masks))
    gy, gx = tf.image.image_gradients(target)
    tv = tf.reduce_sum(tf.abs(gy) + tf.abs(gx))
    l2 = tf.reduce_sum(tf.square(target))
    loss = lam_df * df + lam_tv * tv + lam_l2 * l2
    if lam_l1 > 0:
        loss += lam_l1 * tf.reduce_sum(tf.abs(target))
    return float(loss)


def test_sr_loss_matches_tf_reference():
    rng = np.random.default_rng(0)
    n, hr, lr = 6, 64, 16
    target = rng.uniform(0, 1, (1, hr, hr, 1)).astype(np.float32)
    masks = rng.uniform(0, 1, (n, lr, lr, 1)).astype(np.float32)
    angles = rng.uniform(-0.3, 0.3, n).astype(np.float32)
    shifts = rng.uniform(-5, 5, (n, 2)).astype(np.float32)
    cfg = SRConfig(lambda_df=1.0, lambda_tv=0.3, lambda_L2=0.7, lambda_L1=0.1,
                   num_aug=n, feature_size=(lr, lr), output_size=(hr, hr),
                   warp_impl="gather")
    ours = float(sr_loss(jnp.asarray(target), jnp.asarray(masks),
                         jnp.asarray(angles), jnp.asarray(shifts), cfg))
    golden = _tf_reference_loss(target, masks, angles, shifts,
                                1.0, 0.3, 0.7, 0.1, (lr, lr))
    np.testing.assert_allclose(ours, golden, rtol=1e-4)


def test_adam_matches_tf_adam():
    """optax.adam update trajectory == tf.optimizers.Adam (eps outside sqrt)."""
    x0 = np.array([5.0, -3.0, 2.0], np.float32)

    v = tf.Variable(x0)
    tf_opt = tf.optimizers.Adam(learning_rate=1e-2, epsilon=1e-7)
    for _ in range(25):
        with tf.GradientTape() as tape:
            loss = tf.reduce_sum(tf.square(v - 1.0))
        g = tape.gradient(loss, [v])
        tf_opt.apply_gradients(zip(g, [v]))
    tf_result = v.numpy()

    opt = make_optimizer(OptimizerConfig(name="adam", learning_rate=1e-2))
    x = jnp.asarray(x0)
    state = opt.init(x)
    for _ in range(25):
        g = jax.grad(lambda t: jnp.sum(jnp.square(t - 1.0)))(x)
        updates, state = opt.update(g, state, x)
        x = x + updates
    np.testing.assert_allclose(np.asarray(x), tf_result, rtol=1e-5, atol=1e-6)


def test_exponential_decay_matches_keras_schedule():
    sched = make_schedule(OptimizerConfig(lr_scheduler=True, learning_rate=1e-3,
                                          decay_steps=60, decay_rate=0.3))
    keras_sched = tf.keras.optimizers.schedules.ExponentialDecay(
        1e-3, decay_steps=60, decay_rate=0.3)
    for step in [0, 1, 59, 60, 150, 299]:
        np.testing.assert_allclose(float(sched(step)), float(keras_sched(step)),
                                   rtol=1e-6)


def test_forward_operator_shapes_and_identity():
    target = jnp.ones((1, 32, 32, 1))
    angles = jnp.zeros(3)
    shifts = jnp.zeros((3, 2))
    out = forward_operator(target, angles, shifts, (8, 8))
    assert out.shape == (3, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


@pytest.mark.parametrize("warp_impl,min_iou", [
    ("gather", 0.9),   # exact reference operator
    ("shear", 0.9),    # TPU shear warp, same operator structure
])
def test_augmented_sr_recovers_synthetic_mask(warp_impl, min_iou):
    """End-to-end solver correctness: generate LR observations of a known
    binary HR mask through the *reference* forward operator (gather+hr),
    solve with each operator variant, and check IoU of the recovery."""
    hr, lr, n = 64, 16, 24
    rng = np.random.default_rng(0)
    gt = np.zeros((hr, hr, 1), np.float32)
    gt[20:44, 16:48] = 1.0

    angles = rng.uniform(-0.25, 0.25, n).astype(np.float32)
    shifts = rng.uniform(-6, 6, (n, 2)).astype(np.float32)
    angles[0] = 0.0
    shifts[0] = 0.0
    masks = forward_operator(jnp.asarray(gt)[None], jnp.asarray(angles),
                             jnp.asarray(shifts), (lr, lr))

    cfg = SRConfig(lambda_df=1.0, lambda_tv=0.05, lambda_L2=0.01,
                   num_iter=150, num_aug=n, feature_size=(lr, lr),
                   output_size=(hr, hr), warp_impl=warp_impl,
                   angle_max=0.3,
                   optimizer=OptimizerConfig(learning_rate=5e-2, amsgrad=True))
    est, loss = augmented_superresolution(masks, jnp.asarray(angles),
                                          jnp.asarray(shifts), cfg)
    est_mask = np.asarray(threshold_image(est, 8, th_factor=0.5))
    gt_mask = (gt[..., 0] * 8).astype(np.int32)
    iou = float(single_class_iou(gt_mask, est_mask[..., 0], 8))
    assert iou > min_iou, f"recovered IoU too low: {iou} (final loss {float(loss)})"


def test_max_mean_sr_identity_copies():
    """With identity transforms every inverse-warped copy equals the upsampled
    mask, so max == mean == that upsample."""
    lr_masks = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (5, 8, 8, 1)).astype(np.float32))
    masks = jnp.broadcast_to(lr_masks[0], lr_masks.shape)
    angles = jnp.zeros(5)
    shifts = jnp.zeros((5, 2))
    cfg = SRConfig(num_aug=5, feature_size=(8, 8), output_size=(32, 32))
    mx, _ = max_superresolution(masks, angles, shifts, cfg)
    mn, _ = mean_superresolution(masks, angles, shifts, cfg)
    np.testing.assert_allclose(np.asarray(mx), np.asarray(mn), rtol=1e-5)


def test_copy_dropout_zeroes_the_right_count():
    from deeplabv3plus_augmented_superresolution_tpu.sr.solver import _dropout_weights
    cfg = SRConfig(num_aug=10, copy_dropout=0.3)
    w = _dropout_weights(jax.random.key(0), cfg)
    assert w.shape == (10,)
    assert int(w.sum()) == 7
    assert _dropout_weights(None, cfg) is None
    assert _dropout_weights(jax.random.key(0), SRConfig(num_aug=10)) is None


def test_threshold_image_modes():
    img = np.array([[0.1, 0.5], [0.9, 0.2]], np.float32)
    out = np.asarray(threshold_image(img, 8, th_factor=0.5))
    np.testing.assert_array_equal(out, [[0, 8], [8, 0]])
    mask = np.full((2, 2), 0.45, np.float32)
    out = np.asarray(threshold_image(img, 3, th_mask=mask))
    np.testing.assert_array_equal(out, [[0, 3], [3, 0]])


def test_sgd_copy_minibatch_recovery():
    """Stochastic copy minibatching recovers the synthetic mask as well as the
    full data term (unbiased df gradient, num_aug/sgd_copies rescaled)."""
    hr, lr, n = 64, 16, 24
    rng = np.random.default_rng(0)
    gt = np.zeros((hr, hr, 1), np.float32)
    gt[20:44, 16:48] = 1.0
    angles = rng.uniform(-0.25, 0.25, n).astype(np.float32)
    shifts = rng.uniform(-6, 6, (n, 2)).astype(np.float32)
    angles[0] = 0.0
    shifts[0] = 0.0
    masks = forward_operator(jnp.asarray(gt)[None], jnp.asarray(angles),
                             jnp.asarray(shifts), (lr, lr))
    cfg = SRConfig(lambda_df=1.0, lambda_tv=0.05, lambda_L2=0.01,
                   num_iter=150, num_aug=n, feature_size=(lr, lr),
                   output_size=(hr, hr), angle_max=0.3, sgd_copies=6,
                   optimizer=OptimizerConfig(learning_rate=5e-2, amsgrad=True))
    est, _ = augmented_superresolution(masks, jnp.asarray(angles),
                                       jnp.asarray(shifts), cfg,
                                       dropout_key=jax.random.key(7))
    est_mask = np.asarray(threshold_image(est, 8, th_factor=0.5))
    iou = float(single_class_iou((gt[..., 0] * 8).astype(np.int32),
                                 est_mask[..., 0], 8))
    assert iou > 0.88, f"minibatched recovery IoU {iou}"


def test_bf16_solve_recovery():
    """bfloat16 warp work in the solve keeps mask-level recovery quality."""
    hr, lr, n = 64, 16, 24
    rng = np.random.default_rng(0)
    gt = np.zeros((hr, hr, 1), np.float32)
    gt[20:44, 16:48] = 1.0
    angles = rng.uniform(-0.25, 0.25, n).astype(np.float32)
    shifts = rng.uniform(-6, 6, (n, 2)).astype(np.float32)
    angles[0] = 0.0
    shifts[0] = 0.0
    masks = forward_operator(jnp.asarray(gt)[None], jnp.asarray(angles),
                             jnp.asarray(shifts), (lr, lr))
    cfg = SRConfig(lambda_df=1.0, lambda_tv=0.05, lambda_L2=0.01,
                   num_iter=150, num_aug=n, feature_size=(lr, lr),
                   output_size=(hr, hr), angle_max=0.3,
                   solve_dtype="bfloat16",
                   optimizer=OptimizerConfig(learning_rate=5e-2, amsgrad=True))
    est, _ = augmented_superresolution(masks, jnp.asarray(angles),
                                       jnp.asarray(shifts), cfg)
    est_mask = np.asarray(threshold_image(est, 8, th_factor=0.5))
    iou = float(single_class_iou((gt[..., 0] * 8).astype(np.int32),
                                 est_mask[..., 0], 8))
    assert iou > 0.88, f"bf16 recovery IoU {iou}"


def test_fast_preset_matches_reference_quality():
    """60 tuned iterations (lr 1e-2, fast decay) recover the synthetic mask as
    well as 300 reference-style iterations — basis of the documented fast
    preset (README/NOTES)."""
    hr, lr, n = 64, 16, 24
    rng = np.random.default_rng(0)
    gt = np.zeros((hr, hr, 1), np.float32)
    gt[20:44, 16:48] = 1.0
    angles = rng.uniform(-0.25, 0.25, n).astype(np.float32)
    shifts = rng.uniform(-6, 6, (n, 2)).astype(np.float32)
    angles[0] = 0.0
    shifts[0] = 0.0
    masks = forward_operator(jnp.asarray(gt)[None], jnp.asarray(angles),
                             jnp.asarray(shifts), (lr, lr))

    def iou_for(num_iter, lrate, steps, rate):
        cfg = SRConfig(lambda_df=1.0, lambda_tv=0.05, lambda_L2=0.01,
                       num_iter=num_iter, num_aug=n, feature_size=(lr, lr),
                       output_size=(hr, hr), angle_max=0.3,
                       optimizer=OptimizerConfig(learning_rate=lrate,
                                                 amsgrad=True,
                                                 lr_scheduler=True,
                                                 decay_steps=steps,
                                                 decay_rate=rate))
        est, _ = augmented_superresolution(masks, jnp.asarray(angles),
                                           jnp.asarray(shifts), cfg)
        m = np.asarray(threshold_image(est, 8, th_factor=0.5))
        return float(single_class_iou((gt[..., 0] * 8).astype(np.int32),
                                      m[..., 0], 8))

    slow = iou_for(300, 1e-2, 60, 0.3)
    fast = iou_for(60, 2e-2, 12, 0.1)
    assert fast >= slow - 0.02, f"fast {fast} vs slow {slow}"
