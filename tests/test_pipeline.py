"""Pipeline tests: augmentation, fused feature maps, end-to-end ASR, hdf5 staging."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deeplabv3plus_augmented_superresolution_tpu.data import (
    load_sr_data,
    write_augmented_hdf5,
)
from deeplabv3plus_augmented_superresolution_tpu.models import DeepLabConfig, build_model
from deeplabv3plus_augmented_superresolution_tpu.pipeline import (
    asr_step,
    augmented_feature_maps,
    create_augmented_copies,
    sample_augmentations,
)
from deeplabv3plus_augmented_superresolution_tpu.sr import OptimizerConfig, SRConfig


@pytest.fixture(scope="module")
def small_model():
    cfg = DeepLabConfig(input_shape=(64, 64, 3), backbone="mobilenet",
                        final_upsample=False)
    params, _ = build_model(cfg, seed=0)
    return cfg, params


def test_create_augmented_copies_identity_first():
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (32, 32, 3)).astype(np.float32))
    copies, angles, shifts = create_augmented_copies(img, 8, 0.3, 5.0,
                                                     key=jax.random.key(1234))
    assert copies.shape == (8, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(copies[0]), np.asarray(img), atol=1e-6)
    assert float(angles[0]) == 0.0 and float(shifts[0].sum()) == 0.0
    assert np.abs(np.asarray(angles)).max() <= 0.3
    assert np.abs(np.asarray(shifts)).max() <= 5.0


def test_sample_augmentations_deterministic():
    a1, s1 = sample_augmentations(jax.random.key(7), 16, 0.5, 30)
    a2, s2 = sample_augmentations(jax.random.key(7), 16, 0.5, 30)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_augmented_feature_maps_shapes_and_chunking(small_model):
    cfg, params = small_model
    img = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (64, 64, 3)).astype(np.float32))
    angles, shifts = sample_augmentations(jax.random.key(0), 8, 0.3, 5.0)
    masks, max_masks = augmented_feature_maps(params, img, angles, shifts, cfg,
                                              class_id=8, mode="argmax", num_aug=8)
    assert masks.shape == (8, 8, 8, 1)  # mobilenet OS8: 64/8
    vals = np.unique(np.asarray(masks))
    assert set(vals).issubset({0.0, 8.0})

    chunked, _ = augmented_feature_maps(params, img, angles, shifts, cfg,
                                        class_id=8, mode="argmax", num_aug=8,
                                        chunk_size=4)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(masks), atol=1e-5)


def test_asr_step_end_to_end(small_model):
    cfg, params = small_model
    img = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (64, 64, 3)).astype(np.float32))
    angles, shifts = sample_augmentations(jax.random.key(3), 6, 0.2, 4.0)
    sr_cfg = SRConfig(num_iter=10, num_aug=6, feature_size=(8, 8),
                      output_size=(64, 64),
                      optimizer=OptimizerConfig(learning_rate=1e-2))
    out = asr_step(params, img, angles, shifts, cfg, sr_cfg, class_id=8,
                   mode="argmax", th_factor=0.2)
    assert set(out) == {"aug", "max", "mean", "standard"}
    for key, mask in out.items():
        assert mask.shape == (64, 64, 1), key
        assert set(np.unique(np.asarray(mask))).issubset({0.0, 8.0}), key


def test_asr_step_slice_max_uses_mask_threshold(small_model):
    cfg, params = small_model
    img = jnp.asarray(np.random.default_rng(4).uniform(0, 1, (64, 64, 3)).astype(np.float32))
    angles, shifts = sample_augmentations(jax.random.key(5), 4, 0.2, 4.0)
    sr_cfg = SRConfig(num_iter=5, num_aug=4, feature_size=(8, 8),
                      output_size=(64, 64))
    out = asr_step(params, img, angles, shifts, cfg, sr_cfg, class_id=8,
                   mode="slice_max", sr_types=("mean",))
    assert set(out) == {"mean", "standard"}


def test_hdf5_roundtrip_reference_layout(tmp_path):
    rng = np.random.default_rng(0)
    masks = rng.uniform(0, 8, (10, 16, 16, 1)).astype(np.float32)
    angles = rng.uniform(-0.3, 0.3, 10).astype(np.float32)
    shifts = rng.uniform(-5, 5, (10, 2)).astype(np.float32)
    path = write_augmented_hdf5(str(tmp_path), "2007_000042", masks, angles,
                                shifts, mode="argmax", angle_max=0.3, shift_max=5)

    import h5py
    with h5py.File(path) as f:  # reference-compatible layout
        assert set(f.keys()) == {"class_masks", "angles", "shifts"}
        assert f.attrs["mode"] == "argmax"
        assert f.attrs["filename"] == "2007_000042"

    loaded, max_masks, a, s, name = load_sr_data(path, num_aug=10)
    assert name == "2007_000042"
    assert max_masks is None
    np.testing.assert_array_equal(a, angles)
    # argmax mode -> global [0,1] normalization applied on load
    arr = np.asarray(loaded)
    assert arr.min() == 0.0 and arr.max() == 1.0
    np.testing.assert_allclose(arr, (masks - masks.min()) / (masks.max() - masks.min()),
                               rtol=1e-5)

    with pytest.raises(ValueError):
        load_sr_data(path, num_aug=11)  # validity check (first-dim >= num_aug)
