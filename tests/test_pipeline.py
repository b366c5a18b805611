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


def test_warp_augment_batch_label_semantics():
    """Train-time TTA augmentation (pipeline.warp_augment_batch): labels stay
    a SUBSET of the originals plus the background fill (nearest = pixel
    permutation-with-fill, no blended labels), warped-in borders are labeled
    0 = background, prob=0 is the identity, and images/labels move together
    (fg label mass tracks the warped fg color mass)."""
    from deeplabv3plus_augmented_superresolution_tpu.pipeline import (
        warp_augment_batch,
    )

    rng = np.random.default_rng(0)
    b, hw = 4, 64
    images = rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32)
    labels = np.zeros((b, hw, hw), np.int32)
    labels[:, 20:44, 24:48] = 8
    labels[:, 20, 24] = 255  # a void pixel must survive as 255, not blend
    images[labels == 8] = 1.0

    im0, lb0 = warp_augment_batch(jax.random.key(0), jnp.asarray(images),
                                  jnp.asarray(labels), angle_max=0.15,
                                  shift_max=10.0, prob=0.0)
    np.testing.assert_array_equal(np.asarray(lb0), labels)
    np.testing.assert_allclose(np.asarray(im0), images, atol=1e-6)

    im1, lb1 = warp_augment_batch(jax.random.key(1), jnp.asarray(images),
                                  jnp.asarray(labels), angle_max=0.15,
                                  shift_max=12.0, prob=1.0)
    lb1 = np.asarray(lb1)
    assert lb1.dtype == labels.dtype
    assert set(np.unique(lb1)) <= {0, 8, 255}
    assert (lb1 != labels).any()  # something actually moved
    # fg label mass is conserved up to what left the frame / border rounding
    fg_in, fg_out = (labels == 8).sum(), (lb1 == 8).sum()
    assert 0.7 * fg_in <= fg_out <= 1.05 * fg_in
    # labels track the image: fg pixels still sit on the bright fg color
    im1 = np.asarray(im1)
    assert im1[lb1 == 8].mean() > 0.9


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


def test_shared_tta_staging_and_stencil_passthrough(small_model, tmp_path):
    """--shared_tta staging gives every image identical (angles, shifts), and
    compute_sr with the matching precomputed stencil reproduces the inline-
    extraction solve (the sweep-amortization path)."""
    import dataclasses

    from PIL import Image

    from deeplabv3plus_augmented_superresolution_tpu.pipeline import (
        compute_augmented_feature_maps,
    )
    from deeplabv3plus_augmented_superresolution_tpu.sr import (
        precompute_gram_stencil,
    )
    from deeplabv3plus_augmented_superresolution_tpu.sr.orchestrate import (
        compute_sr,
    )

    cfg, params = small_model
    rng = np.random.default_rng(0)
    paths = []
    for name in ("2007_000001", "2007_000002"):
        img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        p = tmp_path / f"{name}.jpg"
        Image.fromarray(img).save(p)
        paths.append(str(p))

    staged = [compute_augmented_feature_maps(
        params, cfg, p, filter_class_id=8, num_aug=6, angle_max=0.2,
        shift_max=4, image_size=(64, 64), shared_tta=True) for p in paths]
    (_, _, a0, s0, _), (_, _, a1, s1, _) = staged
    np.testing.assert_array_equal(a0, a1)
    np.testing.assert_array_equal(s0, s1)

    # Per-image mode still differs between images.
    b0 = compute_augmented_feature_maps(
        params, cfg, paths[0], filter_class_id=8, num_aug=6, angle_max=0.2,
        shift_max=4, image_size=(64, 64))
    b1 = compute_augmented_feature_maps(
        params, cfg, paths[1], filter_class_id=8, num_aug=6, angle_max=0.2,
        shift_max=4, image_size=(64, 64))
    assert not np.array_equal(b0[2], b1[2])

    masks = jnp.asarray(staged[0][0], jnp.float32)
    masks = (masks - masks.min()) / (masks.max() - masks.min() + 1e-9)
    angles, shifts = jnp.asarray(a0), jnp.asarray(s0)
    sr_cfg = SRConfig(num_aug=6, feature_size=masks.shape[1:3],
                      output_size=(64, 64), angle_max=0.2, num_iter=20,
                      solver_impl="gram",
                      optimizer=OptimizerConfig(learning_rate=1e-2))
    coeffs = precompute_gram_stencil(angles, shifts, sr_cfg)
    with_stencil = compute_sr(sr_cfg, masks, angles, shifts, "x",
                              sr_type="aug", class_id=8, th_factor=0.5,
                              gram_coeffs=coeffs)
    inline = compute_sr(sr_cfg, masks, angles, shifts, "x", sr_type="aug",
                        class_id=8, th_factor=0.5)
    np.testing.assert_allclose(with_stencil, inline, atol=1e-6)
