"""Persistent Gram-stencil cache (sr/stencil_cache.py): the serving warm-
start path. Measured on v5e: 45-145 s extraction -> <1 s warm load; the key
must cover exactly the operator-shaping inputs (TTA set + SRConfig operator
fields) and nothing else, so restarts hit and config changes miss."""

import dataclasses

import numpy as np

import jax

from deeplabv3plus_augmented_superresolution_tpu.pipeline import (
    sample_augmentations,
)
from deeplabv3plus_augmented_superresolution_tpu.sr import (
    SRConfig,
    load_stencil,
    precompute_gram_stencil,
    save_stencil,
    stencil_cache_key,
)


def _cfg(**kw):
    base = dict(num_aug=6, feature_size=(8, 8), output_size=(32, 32),
                angle_max=0.3, solver_impl="gram")
    base.update(kw)
    return SRConfig(**base)


def test_roundtrip_and_exactness(tmp_path):
    cfg = _cfg()
    angles, shifts = sample_augmentations(jax.random.key(0), 6, 0.2, 3.0)
    coeffs = precompute_gram_stencil(angles, shifts, cfg)

    assert load_stencil(str(tmp_path), angles, shifts, cfg) is None  # miss
    path = save_stencil(str(tmp_path), angles, shifts, cfg, coeffs)
    got = load_stencil(str(tmp_path), angles, shifts, cfg)
    np.testing.assert_array_equal(got, np.asarray(coeffs))
    assert path.endswith(f"stencil_{stencil_cache_key(angles, shifts, cfg)}.npz")


def test_key_sensitivity(tmp_path):
    """Hits only for the exact (TTA set, operator config); lambda/iteration
    changes share the stencil (they do not shape the operator)."""
    cfg = _cfg()
    angles, shifts = sample_augmentations(jax.random.key(0), 6, 0.2, 3.0)
    k = stencil_cache_key(angles, shifts, cfg)

    a2, s2 = sample_augmentations(jax.random.key(1), 6, 0.2, 3.0)
    assert stencil_cache_key(a2, s2, cfg) != k
    assert stencil_cache_key(angles, shifts,
                             _cfg(feature_size=(16, 16))) != k
    assert stencil_cache_key(angles, shifts, _cfg(angle_max=0.4)) != k
    assert stencil_cache_key(angles, shifts,
                             _cfg(operator_impl="staged")) != k
    # non-operator fields: same stencil, same key
    same = dataclasses.replace(cfg, lambda_tv=9.9, num_iter=7,
                               solver_impl="cg")
    assert stencil_cache_key(angles, shifts, same) == k


def test_corrupt_entry_is_a_miss(tmp_path):
    cfg = _cfg()
    angles, shifts = sample_augmentations(jax.random.key(0), 6, 0.2, 3.0)
    path = save_stencil(str(tmp_path), angles, shifts, cfg,
                        np.zeros((3, 3), np.float32))
    with open(path, "wb") as f:
        f.write(b"not an npz")
    assert load_stencil(str(tmp_path), angles, shifts, cfg) is None
