"""Gram-stencil solver: exactness vs the direct data-term and solve parity."""

import numpy as np

import jax
import jax.numpy as jnp

from deeplabv3plus_augmented_superresolution_tpu.ops.gram import (
    RADIUS_X,
    RADIUS_Y,
    apply_gram,
    extract_gram_stencil,
)
from deeplabv3plus_augmented_superresolution_tpu.sr import (
    OptimizerConfig,
    SRConfig,
    augmented_superresolution,
    forward_operator,
)


def _setup(hr=64, lr=16, n=8, seed=0):
    rng = np.random.default_rng(seed)
    angles = rng.uniform(-0.25, 0.25, n).astype(np.float32)
    shifts = rng.uniform(-6, 6, (n, 2)).astype(np.float32)
    angles[0] = 0.0
    shifts[0] = 0.0
    cfg = SRConfig(num_aug=n, feature_size=(lr, lr), output_size=(hr, hr),
                   angle_max=0.3, num_iter=60,
                   optimizer=OptimizerConfig(learning_rate=2e-2, amsgrad=True))
    return cfg, jnp.asarray(angles), jnp.asarray(shifts), rng


def test_stencil_matches_direct_normal_operator():
    """apply_gram(x) == A^T A x exactly (support fits the static radii)."""
    cfg, angles, shifts, rng = _setup()

    def fwd(z):
        return forward_operator(z, angles, shifts, cfg.feature_size, cfg)

    def normal_op(x):
        out, vjp = jax.vjp(fwd, x)
        return vjp(out)[0]

    coeffs = extract_gram_stencil(normal_op, cfg.output_size)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32))
    direct = np.asarray(normal_op(x))
    via_stencil = np.asarray(apply_gram(x, coeffs))
    np.testing.assert_allclose(via_stencil, direct, rtol=2e-4, atol=2e-4)


def test_stencil_exact_at_production_shape():
    """512x512 / angle_max 0.5 / shifts +-80 — the CLI default configuration
    (cli/_common.py) and the worst case for the static stencil radii
    (RADIUS_Y/X) and the shear _PAD clipping. Uses extreme corner angles and
    shifts rather than random draws to stress the support bound."""
    angles = jnp.asarray([0.5, -0.5, 0.49, -0.32, 0.11, 0.0], jnp.float32)
    shifts = jnp.asarray([[80, -80], [-80, 80], [79, 79], [-45, 60],
                          [12, -70], [0, 0]], jnp.float32)
    cfg = SRConfig(num_aug=6, feature_size=(128, 128), output_size=(512, 512),
                   angle_max=0.5, num_iter=10,
                   optimizer=OptimizerConfig(learning_rate=1e-2))

    def fwd(z):
        return forward_operator(z, angles, shifts, cfg.feature_size, cfg)

    def normal_op(x):
        out, vjp = jax.vjp(fwd, x)
        return vjp(out)[0]

    coeffs = extract_gram_stencil(normal_op, cfg.output_size)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 512, 512, 1)).astype(np.float32))
    direct = np.asarray(normal_op(x))
    via = np.asarray(apply_gram(x, coeffs))
    scale = np.abs(direct).max()
    np.testing.assert_allclose(via, direct, atol=1e-5 * scale)


def test_gram_solve_matches_direct_solve():
    """The gram solver follows the same optimization trajectory as the direct
    solver (identical objective and gradients up to float reassociation)."""
    import dataclasses

    cfg, angles, shifts, rng = _setup()
    masks = forward_operator(
        jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32)),
        angles, shifts, cfg.feature_size, cfg)

    direct, loss_d = augmented_superresolution(masks, angles, shifts, cfg)
    gram_cfg = dataclasses.replace(cfg, solver_impl="gram")
    gram, loss_g = augmented_superresolution(masks, angles, shifts, gram_cfg)

    np.testing.assert_allclose(float(loss_g), float(loss_d), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gram), np.asarray(direct),
                               atol=5e-3)


def test_gram_solve_with_copy_dropout():
    import dataclasses

    cfg, angles, shifts, rng = _setup()
    cfg = dataclasses.replace(cfg, copy_dropout=0.25)
    masks = forward_operator(
        jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32)),
        angles, shifts, cfg.feature_size, cfg)
    key = jax.random.key(3)
    direct, loss_d = augmented_superresolution(masks, angles, shifts, cfg,
                                               dropout_key=key)
    gram_cfg = dataclasses.replace(cfg, solver_impl="gram")
    gram, loss_g = augmented_superresolution(masks, angles, shifts, gram_cfg,
                                             dropout_key=key)
    np.testing.assert_allclose(float(loss_g), float(loss_d), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gram), np.asarray(direct), atol=2e-2)
