"""Golden tests: ops.warp must match TF's ImageProjectiveTransformV3.

tfa.image.rotate/translate (reference augmentation_utils.py:22-25,
superresolution.py:61-64) wrap tf.raw_ops.ImageProjectiveTransformV3; we
reproduce its transform construction and bilinear/nearest constant-fill
sampling and validate against the raw op (tensorflow-addons itself is not
installed here, the raw op is the exact same kernel).
"""

import numpy as np
import pytest

from deeplabv3plus_augmented_superresolution_tpu.ops import (
    rotate,
    rotation_transform,
    translate,
    translation_transform,
    rotate_translate_fused,
)

tf = pytest.importorskip("tensorflow")


def tf_transform(images, transforms, interpolation="BILINEAR"):
    return tf.raw_ops.ImageProjectiveTransformV3(
        images=images,
        transforms=transforms,
        output_shape=tf.constant(images.shape[1:3], tf.int32),
        fill_value=tf.constant(0.0),
        interpolation=interpolation,
        fill_mode="CONSTANT",
    ).numpy()


def _rand_images(rng, batch=4, size=64, ch=3):
    return rng.uniform(0, 1, size=(batch, size, size, ch)).astype(np.float32)


def test_rotate_matches_tf():
    rng = np.random.default_rng(0)
    images = _rand_images(rng)
    angles = rng.uniform(-0.5, 0.5, size=4).astype(np.float32)
    transforms = np.asarray(rotation_transform(angles, 64, 64))
    ours = np.asarray(rotate(images, angles))
    theirs = tf_transform(images, transforms)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_translate_matches_tf():
    rng = np.random.default_rng(1)
    images = _rand_images(rng)
    shifts = rng.uniform(-20, 20, size=(4, 2)).astype(np.float32)
    transforms = np.asarray(translation_transform(shifts))
    ours = np.asarray(translate(images, shifts))
    theirs = tf_transform(images, transforms)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_rotate_then_translate_two_pass_matches_tf():
    """The exact reference augmentation: rotate then translate, two resamples."""
    rng = np.random.default_rng(2)
    images = _rand_images(rng, batch=3, size=50)
    angles = rng.uniform(-0.3, 0.3, size=3).astype(np.float32)
    shifts = rng.uniform(-15, 15, size=(3, 2)).astype(np.float32)

    ours = np.asarray(translate(rotate(images, angles), shifts))

    t_rot = tf_transform(images, np.asarray(rotation_transform(angles, 50, 50)))
    theirs = tf_transform(t_rot, np.asarray(translation_transform(shifts)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_nearest_interpolation_matches_tf():
    rng = np.random.default_rng(3)
    images = rng.integers(0, 21, size=(2, 40, 40, 1)).astype(np.float32)
    angles = np.array([0.25, -0.4], np.float32)
    transforms = np.asarray(rotation_transform(angles, 40, 40))
    ours = np.asarray(rotate(images, angles, interpolation="nearest"))
    theirs = tf_transform(images, transforms, interpolation="NEAREST")
    np.testing.assert_array_equal(ours, theirs)


def test_identity_transform_is_identity():
    rng = np.random.default_rng(4)
    images = _rand_images(rng, batch=1)
    out = np.asarray(rotate(images, np.zeros(1, np.float32)))
    np.testing.assert_allclose(out, images, atol=1e-6)
    out = np.asarray(translate(images, np.zeros((1, 2), np.float32)))
    np.testing.assert_allclose(out, images, atol=1e-6)


def test_fused_matches_two_pass_in_interior():
    """Fused single-resample warp agrees with two-pass away from resampling
    blur (identity + pure-shift cases are exact)."""
    rng = np.random.default_rng(5)
    images = _rand_images(rng, batch=2, size=48)
    shifts = np.array([[5.0, -3.0], [0.0, 0.0]], np.float32)
    angles = np.zeros(2, np.float32)
    fused = np.asarray(rotate_translate_fused(images, angles, shifts))
    two_pass = np.asarray(translate(rotate(images, angles), shifts))
    np.testing.assert_allclose(fused, two_pass, atol=1e-5)


def test_inverse_warp_roundtrip():
    """translate(-s) . rotate(-a) approximately inverts rotate(a) . translate(s)
    in the image interior — the max/mean SR path (superresolution.py:139-161)."""
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 64.0
    images = np.exp(-((xx - 0.5) ** 2 + (yy - 0.5) ** 2) / 0.05)[None, :, :, None]
    angle = np.array([0.2], np.float32)
    shift = np.array([[6.0, -4.0]], np.float32)
    fwd = translate(rotate(images, angle), shift)
    back = np.asarray(rotate(translate(fwd, -shift), -angle))
    center = (slice(None), slice(24, 40), slice(24, 40), slice(None))
    np.testing.assert_allclose(back[center], images[center], atol=0.15)


def test_bilateral_tv_matches_resampler_formula():
    """bilateral_tv's static pad+slice shifts must be bit-equal to the
    original tfa-style nearest-resample formulation (integer offsets make
    the resample exact), in value AND gradient — the static form exists
    because the resampler cost ~85 ms/iteration inside the solver scan."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deeplabv3plus_augmented_superresolution_tpu.ops import bilateral_tv
    from deeplabv3plus_augmented_superresolution_tpu.ops.warp import translate

    def btv_resampler(image, alpha=0.6, shift_factor=2):
        pairs = [(h, v)
                 for h in range(-shift_factor, shift_factor + 1)
                 for v in range(0, shift_factor + 1)]
        shifts = jnp.asarray(pairs, jnp.float32)
        batched = jnp.broadcast_to(image, (len(pairs),) + image.shape[-3:])
        shifted = translate(batched, shifts, interpolation="nearest")
        l1 = jnp.sum(jnp.abs(batched - shifted), axis=(-3, -2, -1))
        weights = alpha ** jnp.abs(shifts).sum(axis=-1)
        return jnp.sum(weights * l1)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (1, 17, 23, 1)).astype(np.float32))
    v_new, g_new = jax.value_and_grad(bilateral_tv)(x)
    v_old, g_old = jax.value_and_grad(btv_resampler)(x)
    np.testing.assert_allclose(np.asarray(v_new), np.asarray(v_old),
                               rtol=1e-6)
    # f32 accumulation order differs (per-shift loop vs batched sum):
    # tolerance covers summation noise only, not semantics.
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_old),
                               rtol=1e-5, atol=1e-6)
