"""Shear-warp (Paeth) vs gather-warp (tfa-exact) agreement tests."""

import numpy as np

import jax
import jax.numpy as jnp

from deeplabv3plus_augmented_superresolution_tpu.ops.shear_warp import (
    paeth_inverse_rotate_translate,
    paeth_rotate_translate,
)
from deeplabv3plus_augmented_superresolution_tpu.ops.warp import rotate, translate


def _smooth_batch(n=4, size=64, seed=0):
    """Band-limited images so interpolation-scheme differences stay small."""
    rng = np.random.default_rng(seed)
    low = rng.standard_normal((n, 8, 8, 1)).astype(np.float32)
    from deeplabv3plus_augmented_superresolution_tpu.ops.resize import resize
    return np.asarray(resize(low, (size, size)))


def test_pure_translation_matches_gather_exactly():
    imgs = _smooth_batch()
    shifts = np.array([[0, 0], [5.25, -3.5], [-10.0, 7.75], [20, 20]], np.float32)
    angles = np.zeros(4, np.float32)
    ours = np.asarray(paeth_rotate_translate(jnp.asarray(imgs), angles, shifts, 0.3))
    ref = np.asarray(translate(jnp.asarray(imgs), shifts))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_identity_is_exact():
    imgs = _smooth_batch(2)
    out = np.asarray(paeth_rotate_translate(
        jnp.asarray(imgs), np.zeros(2, np.float32), np.zeros((2, 2), np.float32), 0.3))
    np.testing.assert_allclose(out, imgs, atol=1e-6)


def test_rotation_close_to_gather_warp_interior():
    imgs = _smooth_batch(3, size=64, seed=1)
    angles = np.array([0.15, -0.3, 0.07], np.float32)
    shifts = np.array([[3.0, -2.0], [0.0, 5.0], [-4.0, -4.0]], np.float32)
    ours = np.asarray(paeth_rotate_translate(jnp.asarray(imgs), angles, shifts, 0.35))
    ref = np.asarray(translate(rotate(jnp.asarray(imgs), angles), shifts))
    # Interior only: shear zero-fill propagates ~(tan(a/2)+sin(a))*size/2 px
    # inward from the edges, and 3x1-D lerp vs 2x2-D bilerp differ at the ~1%
    # level on band-limited content.
    c = (slice(None), slice(16, 48), slice(16, 48), slice(None))
    err = np.abs(ours[c] - ref[c]).max()
    assert err < 0.05, f"interior max err {err}"
    mean_err = np.abs(ours[c] - ref[c]).mean()
    assert mean_err < 0.003, f"interior mean err {mean_err}"


def test_binary_mask_iou_preserved():
    """Masks are the actual payload: warped binary masks must agree with the
    gather warp at IoU > 0.98 after 0.5-thresholding."""
    mask = np.zeros((1, 128, 128, 1), np.float32)
    mask[0, 40:90, 30:100] = 1.0
    angles = np.array([0.25], np.float32)
    shifts = np.array([[12.0, -7.0]], np.float32)
    ours = np.asarray(paeth_rotate_translate(jnp.asarray(mask), angles, shifts, 0.3)) > 0.5
    ref = np.asarray(translate(rotate(jnp.asarray(mask), angles), shifts)) > 0.5
    inter = (ours & ref).sum()
    union = (ours | ref).sum()
    assert inter / union > 0.98, f"IoU {inter / union}"


def test_inverse_matches_gather_inverse():
    """paeth_inverse == rotate(translate(x, -s), -a) (the reference's max/mean
    un-augmentation, superresolution.py:139-161) up to interpolation scheme."""
    imgs = _smooth_batch(2, size=64, seed=2)
    angles = np.array([0.2, -0.12], np.float32)
    shifts = np.array([[6.0, -4.0], [-3.0, 8.0]], np.float32)
    fwd = paeth_rotate_translate(jnp.asarray(imgs), angles, shifts, 0.3)
    ours = np.asarray(paeth_inverse_rotate_translate(fwd, angles, shifts, 0.3))
    ref = np.asarray(rotate(translate(fwd, -shifts), -angles))
    c = (slice(None), slice(16, 48), slice(16, 48), slice(None))
    assert np.abs(ours[c] - ref[c]).max() < 0.06
    # And the roundtrip recovers the original up to double-resample blur.
    err = np.abs(ours[c] - imgs[c]).max()
    assert err < 0.25, f"roundtrip interior err {err}"


def _label_batch():
    """A VOC-style label map: background 0, class 8 blob, 255 ignore ring."""
    gt = np.zeros((2, 96, 96, 1), np.float32)
    gt[:, 30:70, 25:75] = 8.0
    gt[:, 28:30, 23:77] = 255.0
    gt[:, 70:72, 23:77] = 255.0
    gt[:, 28:72, 23:25] = 255.0
    gt[:, 28:72, 75:77] = 255.0
    return gt


def test_nearest_warp_preserves_label_set():
    """interpolation="nearest" never invents labels: every output value must
    already exist in the input (or be the 0 fill) — the property the
    reference's GT warps rely on (check_robustness.py:47-50)."""
    gt = _label_batch()
    angles = np.array([0.37, -0.52], np.float32)
    shifts = np.array([[17.3, -9.6], [-31.0, 24.5]], np.float32)
    out = np.asarray(paeth_rotate_translate(jnp.asarray(gt), angles, shifts,
                                            0.6, interpolation="nearest"))
    assert set(np.unique(out)) <= {0.0, 8.0, 255.0}, np.unique(out)
    # Bilinear on the same input DOES invent labels (sanity of the property).
    blended = np.asarray(paeth_rotate_translate(jnp.asarray(gt), angles,
                                                shifts, 0.6))
    assert not set(np.unique(np.round(blended))) <= {0.0, 8.0, 255.0}


def test_nearest_warp_matches_gather_nearest():
    """Per-pass rounding vs single-resample nearest: disagreement is confined
    to the ~1px rounding band at label boundaries."""
    gt = _label_batch()
    angles = np.array([0.2, -0.3], np.float32)
    shifts = np.array([[6.0, -4.0], [-3.0, 9.0]], np.float32)
    ours = np.asarray(paeth_rotate_translate(jnp.asarray(gt), angles, shifts,
                                             0.35, interpolation="nearest"))
    ref = np.asarray(translate(rotate(jnp.asarray(gt), angles,
                                      interpolation="nearest"),
                               shifts, interpolation="nearest"))
    agree = (ours == ref).mean()
    assert agree > 0.97, f"agreement {agree}"
    # The class-8 region overlaps at IoU > 0.95.
    inter = ((ours == 8) & (ref == 8)).sum()
    union = ((ours == 8) | (ref == 8)).sum()
    assert inter / union > 0.95, f"class IoU {inter / union}"


def test_nearest_identity_is_exact():
    gt = _label_batch()
    out = np.asarray(paeth_rotate_translate(
        jnp.asarray(gt), np.zeros(2, np.float32), np.zeros((2, 2), np.float32),
        0.3, interpolation="nearest"))
    np.testing.assert_array_equal(out, gt)


def test_differentiable_no_nans():
    imgs = jnp.asarray(_smooth_batch(2, size=32, seed=3))
    angles = jnp.asarray([0.1, -0.2])
    shifts = jnp.asarray([[2.0, 1.0], [-1.5, 3.0]])

    def loss(x):
        return jnp.sum(paeth_rotate_translate(x, angles, shifts, 0.3) ** 2)

    g = jax.grad(loss)(imgs)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_channels_last_broadcast():
    imgs = jnp.asarray(np.random.default_rng(4).uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    out = paeth_rotate_translate(imgs, jnp.zeros(2), jnp.zeros((2, 2)), 0.3)
    assert out.shape == (2, 32, 32, 3)
    # 3D input (no channel) also supported
    out3 = paeth_rotate_translate(imgs[..., 0], jnp.zeros(2), jnp.zeros((2, 2)), 0.3)
    assert out3.shape == (2, 32, 32)
