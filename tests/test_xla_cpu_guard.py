"""Regression guard for the XLA:CPU fusion-emitter miscompile.

Found in round 3 (see NOTES.md "XLA:CPU fusion-emitter miscompile"): with
fusion emitters enabled, a jit program in which a REDUCTION consumes the
3-pass shear warp silently zero-fills one copy's boundary row — max error
0.36 on a [0,1] image, deterministic per program, insensitive to
optimization_barrier / lax.while_loop materialization baffles, healed only
by exposing the warped stack as a program output or by
--xla_cpu_use_fusion_emitters=false. Eager execution, a warp-only jit
program, a scipy affine referee, and the TPU backend all agree on the
correct values, so the fused CPU program is the wrong one.

Blast radius without the guard: every max/mean SR result computed on a CPU
backend (the fake-8-device test mesh and any CPU deployment) — the corruption
was small enough to hide inside the 0.5% mask-disagreement tolerances of the
sharded tests. tests/conftest.py and the package __init__ both disable the
fusion emitters on the CPU client; these tests pin (a) the guard being
active and (b) the numeric agreement it protects.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from deeplabv3plus_augmented_superresolution_tpu.ops.resize import resize
from deeplabv3plus_augmented_superresolution_tpu.ops.shear_warp import (
    paeth_inverse_rotate_translate,
)
from deeplabv3plus_augmented_superresolution_tpu.pipeline import (
    sample_augmentations,
)
from deeplabv3plus_augmented_superresolution_tpu.sr import (
    OptimizerConfig,
    SRConfig,
)
from deeplabv3plus_augmented_superresolution_tpu.sr.solver import (
    max_mean_superresolution,
)


def test_cpu_fusion_emitter_guard_is_active():
    assert "xla_cpu_use_fusion_emitters=false" in os.environ.get("XLA_FLAGS",
                                                                 "")


def test_warp_under_reduction_matches_eager_truth():
    """The exact miscompile shape: reduce(3-pass warp) in one jit program.

    Truth = the eager per-op execution of the same warp (adjudicated against
    a scipy affine referee when the bug was diagnosed). With the guard off
    this fails at ~0.12 max error; with it on, agreement is float32-exact.
    """
    sr_cfg = SRConfig(num_iter=20, num_aug=6, feature_size=(8, 8),
                      output_size=(64, 64), angle_max=0.25,
                      optimizer=OptimizerConfig(learning_rate=1e-2))
    angles, shifts = sample_augmentations(jax.random.key(0), 6, 0.2, 5.0)
    rng = np.random.default_rng(3)
    masks = jnp.asarray(rng.uniform(0, 1, (6, 8, 8, 1)).astype(np.float32))

    up_truth = np.asarray(
        paeth_inverse_rotate_translate(
            resize(masks, (64, 64), method="bilinear"), angles, shifts, 0.25),
        np.float64)

    mx, mean = max_mean_superresolution(masks, angles, shifts, sr_cfg)
    np.testing.assert_allclose(np.asarray(mx, np.float64),
                               up_truth.max(axis=0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean, np.float64),
                               up_truth.mean(axis=0), atol=1e-5)


def test_full_asr_step_jit_matches_eager():
    """Whole-program canary: the fully-fused asr_step program must agree
    with per-op (eager) execution of the same function. A backend miscompile
    anywhere in the fused pipeline (warp, forward, OPM, solve, reductions,
    threshold) shows up here as a gross mismatch; ulp-level reassociation
    drift does not (atol covers it). This is the test that would have caught
    the fusion-emitter bug at the product level."""
    from deeplabv3plus_augmented_superresolution_tpu.models import (
        DeepLabConfig,
        build_model,
    )
    from deeplabv3plus_augmented_superresolution_tpu.pipeline import asr_step

    cfg = DeepLabConfig(input_shape=(64, 64, 3), backbone="mobilenet",
                        final_upsample=False)
    params, _ = build_model(cfg, seed=0)
    sr_cfg = SRConfig(num_iter=3, num_aug=5, feature_size=(8, 8),
                      output_size=(64, 64), angle_max=0.25,
                      optimizer=OptimizerConfig(learning_rate=1e-2))
    angles, shifts = sample_augmentations(jax.random.key(2), 5, 0.2, 5.0)
    rng = np.random.default_rng(9)
    image = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))

    kwargs = dict(class_id=8, mode="argmax", th_factor=0.2,
                  return_targets=True)
    jit_out = asr_step(params, image, angles, shifts, cfg, sr_cfg, **kwargs)
    eager_out = asr_step.__wrapped__(params, image, angles, shifts, cfg,
                                     sr_cfg, **kwargs)
    assert set(jit_out) == set(eager_out)
    for k in eager_out:
        got = np.asarray(jit_out[k], np.float64)
        want = np.asarray(eager_out[k], np.float64)
        if k.endswith("_target") or k == "standard":
            np.testing.assert_allclose(got, want, atol=1e-4, err_msg=k)
        else:
            # binarized masks: ulp-level solver drift may flip an isolated
            # threshold-marginal pixel; a miscompile flips whole rows
            disagree = np.mean(got != want)
            assert disagree < 0.002, (k, disagree)
