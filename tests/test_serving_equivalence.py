"""Serving-mode TTA-set equivalence on the REAL model pipeline.

The serving configuration (cli/run_asr default, the headline bench row) uses
ONE fixed TTA set for the whole run; the reference redraws per image
(augmentation_utils.py:14-15 via np.random state). tests/test_gram.py proves
set-statistics equivalence on synthetic 64-px recovery; this file proves it
through the full fused pipeline — copies -> DeepLab forward -> OPM -> SR ->
threshold — with the actual model in the loop (random weights: the claim is
about TTA-set statistics, not segmentation quality). The production-shape
(512 px/100 copies) counterpart runs on hardware via
scripts/ab_serving_vs_strict.py; bounds documented in PARITY.md.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deeplabv3plus_augmented_superresolution_tpu.models import (
    DeepLabConfig,
    build_model,
)
from deeplabv3plus_augmented_superresolution_tpu.pipeline import (
    asr_step,
    sample_augmentations,
)
from deeplabv3plus_augmented_superresolution_tpu.sr import (
    OptimizerConfig,
    SRConfig,
)


@pytest.fixture(scope="module")
def setup():
    cfg = DeepLabConfig(input_shape=(64, 64, 3), backbone="mobilenet",
                        final_upsample=False)
    params, _ = build_model(cfg, seed=0)
    sr_cfg = SRConfig(lambda_df=1.0, lambda_tv=0.3, lambda_L2=0.7,
                      num_iter=40, num_aug=24, feature_size=(8, 8),
                      output_size=(64, 64), angle_max=0.25,
                      solver_impl="gram",
                      optimizer=OptimizerConfig(learning_rate=1e-2,
                                                amsgrad=True))
    return cfg, params, sr_cfg


def test_fixed_vs_per_image_tta_masks_agree(setup):
    """Full-pipeline A/B: per-image fresh TTA draws vs one run-fixed set.
    The output masks must agree up to a small disagreement rate, and the
    standard mask (TTA-independent) must be bitwise identical."""
    cfg, params, sr_cfg = setup
    n_aug = sr_cfg.num_aug
    a_fix, s_fix = sample_augmentations(jax.random.key(1234), n_aug, 0.2, 6.0)

    rng = np.random.default_rng(0)
    dis = {"aug": [], "max": [], "mean": []}
    for i in range(6):
        low = rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
        from deeplabv3plus_augmented_superresolution_tpu.ops.resize import (
            resize,
        )
        img = jnp.asarray(resize(low, (64, 64))[0])
        a_i, s_i = sample_augmentations(jax.random.key(100 + i), n_aug,
                                        0.2, 6.0)
        m_fix = asr_step(params, img, a_fix, s_fix, cfg, sr_cfg, class_id=8,
                         mode="argmax", th_factor=0.2)
        m_per = asr_step(params, img, a_i, s_i, cfg, sr_cfg, class_id=8,
                         mode="argmax", th_factor=0.2)
        assert np.array_equal(np.asarray(m_fix["standard"]),
                              np.asarray(m_per["standard"]))
        for k in dis:
            dis[k].append(float(np.mean(np.asarray(m_fix[k])
                                        != np.asarray(m_per[k]))))

    # aug SR solves a 24-observation inverse problem — set statistics wash
    # out (this is the serving default and the headline claim). max/mean are
    # per-pixel order statistics: at 24 draws on an 8x8 LR grid they are
    # genuinely set-sensitive (~5-8% here; production-shape numbers at 100
    # draws/512px come from scripts/ab_serving_vs_strict.py, see PARITY.md).
    assert np.mean(dis["aug"]) < 0.02, dis["aug"]
    assert np.mean(dis["mean"]) < 0.12, dis["mean"]
    assert np.mean(dis["max"]) < 0.18, dis["max"]
