"""OPM extraction semantics (reference augmentation_utils.py:80-115,
superres_utils.py:154-210)."""

import numpy as np

from deeplabv3plus_augmented_superresolution_tpu.ops.opm import (
    create_mask,
    extract_masks,
    min_max_normalization,
    normalize_stack,
    prepare_sr_inputs,
)


def _preds(seed=0, n=4, hw=8, c=21):
    return np.random.default_rng(seed).standard_normal((n, hw, hw, c)).astype(np.float32)


def test_argmax_mode():
    preds = _preds()
    masks, max_masks = extract_masks(preds, class_id=8, mode="argmax")
    assert max_masks is None
    assert masks.shape == (4, 8, 8, 1)
    labels = preds.argmax(-1)
    expected = np.where(labels == 8, 8, 0).astype(np.float32)[..., None]
    np.testing.assert_array_equal(np.asarray(masks), expected)


def test_slice_mode_normalizes_by_global_pred_range():
    preds = _preds(1)
    masks, _ = extract_masks(preds, class_id=3, mode="slice")
    for i in range(preds.shape[0]):
        gmin, gmax = preds[i].min(), preds[i].max()
        expected = (preds[i, ..., 3:4] - gmin) / (gmax - gmin)
        np.testing.assert_allclose(np.asarray(masks[i]), expected, rtol=1e-5)
    assert np.asarray(masks).min() >= 0 and np.asarray(masks).max() <= 1


def test_slice_max_mode():
    preds = _preds(2)
    masks, max_masks = extract_masks(preds, class_id=8, mode="slice_max")
    np.testing.assert_array_equal(np.asarray(masks), preds[..., 8:9])
    others = np.delete(preds, 8, axis=-1)
    np.testing.assert_allclose(np.asarray(max_masks),
                               others.max(-1, keepdims=True), rtol=1e-6)


def test_min_max_normalization_matches_reference_defaults():
    img = np.array([[1.0, 3.0], [5.0, 9.0]], np.float32)
    out = np.asarray(min_max_normalization(img, 0.0, 1.0))
    np.testing.assert_allclose(out, (img - 1) / 8)
    # degenerate range guarded to den=1 (reference superres_utils.py:61)
    flat = np.full((2, 2), 7.0, np.float32)
    out = np.asarray(min_max_normalization(flat, 0.0, 1.0))
    np.testing.assert_allclose(out, 0.0)


def test_normalize_stack_global_vs_per_copy():
    stack = np.stack([np.full((4, 4, 1), 2.0), np.full((4, 4, 1), 6.0)]).astype(np.float32)
    g = np.asarray(normalize_stack(stack, global_normalize=True))
    np.testing.assert_allclose(g[0], 0.0)
    np.testing.assert_allclose(g[1], 1.0)
    p = np.asarray(normalize_stack(stack, global_normalize=False))
    # per-copy min==max -> den guard -> zeros
    np.testing.assert_allclose(p, 0.0)


def test_prepare_sr_inputs_slice_passthrough():
    stack = np.random.default_rng(3).uniform(0, 1, (4, 8, 8, 1)).astype(np.float32)
    out, _ = prepare_sr_inputs(stack, None, mode="slice")
    np.testing.assert_array_equal(np.asarray(out), stack)
    out, _ = prepare_sr_inputs(stack * 8, None, mode="argmax")
    assert np.asarray(out).max() <= 1.0


def test_create_mask():
    preds = _preds(4, n=1)
    m = np.asarray(create_mask(preds[0]))
    assert m.shape == (8, 8, 1)
    np.testing.assert_array_equal(m[..., 0], preds[0].argmax(-1))


def test_get_prediction_single_image_surface():
    """get_prediction(apply_fn, params, image) == create_mask of a one-image
    forward (reference utils.py:122-127)."""
    import jax.numpy as jnp
    import numpy as np

    from deeplabv3plus_augmented_superresolution_tpu.models import (
        DeepLabConfig, build_model)
    from deeplabv3plus_augmented_superresolution_tpu.ops import (
        create_mask, get_prediction)

    cfg = DeepLabConfig(input_shape=(64, 64, 3), backbone="mobilenet",
                        final_upsample=False)
    params, apply_fn = build_model(cfg, seed=0)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    mask = get_prediction(apply_fn, params, image)
    want = create_mask(apply_fn(params, image[None])[0])
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(want))
    assert mask.shape[-1] == 1
