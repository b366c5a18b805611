"""Multi-class ASR: one forward pass + one Gram stencil, K vmapped solves.

The reference is single-class per run (README.md:5-6 — a fixed class_id like
8=cat); recovering K classes there means K full staged pipelines. Our
asr_step_multiclass shares the copies warp, the DeepLabV3+ forward, and the
class-independent Gram stencil across all classes. These tests pin the
correctness contract: every per-class slice of the multiclass program equals
the single-class program's output exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deeplabv3plus_augmented_superresolution_tpu.models import (
    DeepLabConfig,
    build_model,
)
from deeplabv3plus_augmented_superresolution_tpu.ops.opm import (
    extract_masks,
    extract_masks_multiclass,
)
from deeplabv3plus_augmented_superresolution_tpu.pipeline import (
    asr_step,
    asr_step_multiclass,
    sample_augmentations,
)
from deeplabv3plus_augmented_superresolution_tpu.sr import (
    OptimizerConfig,
    SRConfig,
    precompute_gram_stencil,
)


@pytest.mark.parametrize("mode", ["argmax", "slice", "slice_max"])
def test_extract_masks_multiclass_matches_single(mode):
    rng = np.random.default_rng(7)
    preds = jnp.asarray(rng.normal(size=(5, 8, 8, 21)).astype(np.float32))
    class_ids = (3, 8, 15)
    multi_cls, multi_max = extract_masks_multiclass(
        preds, jnp.asarray(class_ids), mode)
    for k, c in enumerate(class_ids):
        single_cls, single_max = extract_masks(preds, c, mode)
        np.testing.assert_array_equal(np.asarray(multi_cls[k]),
                                      np.asarray(single_cls))
        if single_max is None:
            assert multi_max is None
        else:
            np.testing.assert_array_equal(np.asarray(multi_max[k]),
                                          np.asarray(single_max))


@pytest.fixture(scope="module")
def setup():
    cfg = DeepLabConfig(input_shape=(64, 64, 3), backbone="mobilenet",
                        final_upsample=False)
    params, _ = build_model(cfg, seed=0)
    sr_cfg = SRConfig(num_iter=20, num_aug=6, feature_size=(8, 8),
                      output_size=(64, 64), angle_max=0.25,
                      optimizer=OptimizerConfig(learning_rate=1e-2))
    angles, shifts = sample_augmentations(jax.random.key(0), 6, 0.2, 5.0)
    rng = np.random.default_rng(1)
    image = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    return cfg, params, sr_cfg, image, angles, shifts


@pytest.mark.parametrize("mode", ["argmax", "slice_max"])
def test_asr_step_multiclass_matches_single_runs(setup, mode):
    cfg, params, sr_cfg, image, angles, shifts = setup
    class_ids = (2, 9)
    multi = asr_step_multiclass(params, image, angles, shifts, cfg, sr_cfg,
                                class_ids=class_ids, mode=mode,
                                th_factor=0.2, return_targets=True)
    for k, c in enumerate(class_ids):
        single = asr_step(params, image, angles, shifts, cfg, sr_cfg,
                          class_id=c, mode=mode, th_factor=0.2,
                          return_targets=True)
        assert set(multi) == set(single)
        for key in single:
            got = np.asarray(multi[key][k])
            want = np.asarray(single[key])
            assert got.shape == want.shape, key
            if key.endswith("_target"):
                np.testing.assert_allclose(got, want, atol=1e-5, err_msg=key)
            else:
                # thresholded masks: identical up to threshold-margin pixels
                disagree = np.mean(got != want)
                assert disagree < 0.002, (key, disagree)
                assert set(np.unique(got)) <= {0.0, float(c)}, key


def test_multiclass_sharded_batch_matches_single_device(setup):
    """The class axis composes with the ("data","aug") mesh sharding: the
    batched mesh program's per-class outputs match the unsharded multiclass
    step (class axis is unsharded; batch on "data", copies on "aug")."""
    from deeplabv3plus_augmented_superresolution_tpu.parallel import (
        make_asr_batch_fn,
        make_mesh,
        shard_batch,
    )

    cfg, params, sr_cfg, image, angles, shifts = setup
    mesh = make_mesh(shape=(2, 4))
    batch = 2
    images = jnp.stack([image, image * 0.5])
    a = jnp.stack([angles, angles])
    s = jnp.stack([shifts, shifts])
    class_ids = (2, 9)

    fn = make_asr_batch_fn(mesh, cfg, sr_cfg, class_id=class_ids,
                           mode="argmax", th_factor=0.2, sr_types=("aug",),
                           return_label_map=True)
    p, im, a_, s_ = shard_batch(mesh, params, images, a, s)
    out = fn(p, im, a_, s_)
    assert out["aug"].shape == (batch, len(class_ids), 64, 64, 1)
    assert out.pop("label_map").shape == (batch, 64, 64, 1)
    assert out.pop("label_map_standard").shape == (batch, 64, 64, 1)

    # padded-aug cfg must match what the mesh program ran (8 copies / 4
    # shards divide evenly here, so cfg is unchanged)
    single = asr_step_multiclass(params, images[1], angles, shifts, cfg,
                                 sr_cfg, class_ids=class_ids, mode="argmax",
                                 th_factor=0.2, sr_types=("aug",))
    for k in single:
        disagree = np.mean(np.asarray(out[k][1]) != np.asarray(single[k]))
        assert disagree < 0.005, (k, disagree)


def test_multiclass_shares_one_gram_stencil(setup):
    """The serving path: ONE precomputed stencil feeds every class's solve."""
    cfg, params, sr_cfg, image, angles, shifts = setup
    import dataclasses
    sr_cfg = dataclasses.replace(sr_cfg, solver_impl="gram")
    coeffs = precompute_gram_stencil(angles, shifts, sr_cfg)
    class_ids = (2, 9, 14)
    multi = asr_step_multiclass(params, image, angles, shifts, cfg, sr_cfg,
                                class_ids=class_ids, mode="argmax",
                                th_factor=0.2, sr_types=("aug",),
                                gram_coeffs=coeffs, return_targets=True)
    assert multi["aug"].shape == (3, 64, 64, 1)
    for k, c in enumerate(class_ids):
        single = asr_step(params, image, angles, shifts, cfg, sr_cfg,
                          class_id=c, mode="argmax", th_factor=0.2,
                          sr_types=("aug",), gram_coeffs=coeffs,
                          return_targets=True)
        np.testing.assert_allclose(np.asarray(multi["aug_target"][k]),
                                   np.asarray(single["aug_target"]),
                                   atol=1e-5)


def test_label_map_consistent_with_per_class_masks(setup):
    """'label_map' (full-scene HR segmentation, a product the reference
    cannot emit) must agree with the per-class thresholded masks: where
    exactly one class's mask fires, the label map carries that class; where
    none fires, background."""
    cfg, params, sr_cfg, image, angles, shifts = setup
    class_ids = (2, 9, 14)
    out = asr_step_multiclass(params, image, angles, shifts, cfg, sr_cfg,
                              class_ids=class_ids, mode="argmax",
                              th_factor=0.2, sr_types=("aug",),
                              return_label_map=True)
    assert out["label_map"].shape == (64, 64, 1)
    assert out["label_map_standard"].shape == (64, 64, 1)
    label = np.asarray(out["label_map"])[..., 0]
    masks = np.asarray(out["aug"])[..., 0]  # (K, H, W), values {0, cid}
    fired = (masks > 0).sum(axis=0)
    # exactly-one-class pixels: label equals that class
    one = fired == 1
    if one.any():
        winner = masks.max(axis=0)  # the single firing class's id
        np.testing.assert_array_equal(label[one], winner[one])
    # no-class pixels: background
    none = fired == 0
    if none.any():
        assert (label[none] == 0).all()
    # label values restricted to {0} | class_ids
    assert set(np.unique(label)) <= {0.0} | {float(c) for c in class_ids}


@pytest.mark.parametrize("mode,class_chunk", [("argmax", 2), ("slice_max", 1)])
def test_class_chunked_matches_unchunked(setup, mode, class_chunk):
    """class_chunk (the memory knob that makes batched 20-class serving fit
    in HBM) must not change any output — including the ragged case where
    chunk does not divide K (K=3, chunk=2 pads by repeating the last class
    and slices it off)."""
    cfg, params, sr_cfg, image, angles, shifts = setup
    class_ids = (2, 9, 14)
    kwargs = dict(class_ids=class_ids, mode=mode, th_factor=0.2,
                  return_targets=True, return_label_map=(mode == "argmax"))
    want = asr_step_multiclass(params, image, angles, shifts, cfg, sr_cfg,
                               **kwargs)
    got = asr_step_multiclass(params, image, angles, shifts, cfg, sr_cfg,
                              class_chunk=class_chunk, **kwargs)
    assert set(got) == set(want)
    for key in want:
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(want[key]), atol=1e-5,
                                   err_msg=key)


def test_class_chunked_with_dropout_keys(setup):
    """Per-class dropout keys ride the chunked lax.map unchanged: the chunked
    program must draw the same per-class masks (same split keys) as the
    vmapped one."""
    import dataclasses
    cfg, params, sr_cfg, image, angles, shifts = setup
    sr_cfg = dataclasses.replace(sr_cfg, copy_dropout=0.34)
    key = jax.random.key(42)
    kwargs = dict(class_ids=(2, 9, 14), mode="argmax", th_factor=0.2,
                  sr_types=("aug",), return_targets=True, dropout_key=key)
    want = asr_step_multiclass(params, image, angles, shifts, cfg, sr_cfg,
                               **kwargs)
    got = asr_step_multiclass(params, image, angles, shifts, cfg, sr_cfg,
                              class_chunk=2, **kwargs)
    np.testing.assert_allclose(np.asarray(got["aug_target"]),
                               np.asarray(want["aug_target"]), atol=1e-5)


def test_combine_label_map_rules():
    """sr/postprocess.py combine_label_map: the class_peak rule inflates an
    ABSENT class's noise to peak 1.0 (so it can steal pixels at many
    classes), while scene_peak and raw keep absent classes near zero.
    Fabricated 2-class scene: class 5 strong (true peak 0.9), class 7
    absent (noise peak 0.09)."""
    import jax.numpy as jnp
    import numpy as np

    from deeplabv3plus_augmented_superresolution_tpu.sr import (
        combine_label_map,
    )

    targets = np.zeros((2, 8, 8, 1), np.float32)
    targets[0, 2:6, 2:6, 0] = 0.9          # class 5: present, strong
    targets[1, :, :, 0] = 0.08             # class 7: absent, flat noise...
    targets[1, 0, 0, 0] = 0.09             # ...with a noise peak
    cls = jnp.asarray([5, 7], jnp.int32)

    # class_peak: class 7's noise normalizes to 1.0 everywhere-ish and
    # clears th=0.65 across the whole scene, stealing every background
    # pixel (0.08/0.09 = 0.89 > 0.65).
    lm = np.asarray(combine_label_map(jnp.asarray(targets), cls, 0.65,
                                      rule="class_peak"))[..., 0]
    assert (lm == 7).sum() > 30            # absent class floods the map

    # scene_peak: joint normalization keeps class 7 at 0.09/0.9 = 0.1,
    # below threshold; class 5's block survives, background stays 0.
    lm = np.asarray(combine_label_map(jnp.asarray(targets), cls, 0.65,
                                      rule="scene_peak"))[..., 0]
    assert (lm == 7).sum() == 0
    assert (lm[2:6, 2:6] == 5).all() and lm[0, :].sum() == 0

    # raw: absolute floor 0.5 — same outcome here.
    lm = np.asarray(combine_label_map(jnp.asarray(targets), cls, 0.5,
                                      rule="raw"))[..., 0]
    assert (lm == 7).sum() == 0 and (lm[2:6, 2:6] == 5).all()

    import pytest as _pytest
    with _pytest.raises(ValueError):
        combine_label_map(jnp.asarray(targets), cls, 0.5, rule="bogus")


def test_combine_label_map_gated_rule():
    """'gated' = class_peak normalization with an absolute presence gate:
    absent classes (raw peak below gate_th) are zeroed instead of inflated,
    present-but-weak classes keep the adaptive per-class scale that the
    fixed-floor 'raw' rule under-fires."""
    import jax.numpy as jnp
    import numpy as np

    from deeplabv3plus_augmented_superresolution_tpu.sr import (
        combine_label_map,
    )

    targets = np.zeros((3, 8, 8, 1), np.float32)
    targets[0, 2:6, 2:6, 0] = 0.9          # class 5: present, strong
    targets[1, 0:2, 6:8, 0] = 0.62         # class 6: present, weak (peak .62)
    targets[2, :, :, 0] = 0.08             # class 7: absent noise
    targets[2, 0, 0, 0] = 0.09
    cls = jnp.asarray([5, 6, 7], jnp.int32)

    lm = np.asarray(combine_label_map(jnp.asarray(targets), cls, 0.65,
                                      rule="gated", gate_th=0.5))[..., 0]
    assert (lm == 7).sum() == 0            # absent class gated out
    assert (lm[2:6, 2:6] == 5).all()       # strong class survives
    # weak present class: its own peak normalizes to 1.0 > th 0.65 — kept
    # (raw at floor 0.65 would have dropped these 0.62-score pixels).
    assert (lm[0:2, 6:8] == 6).all()
