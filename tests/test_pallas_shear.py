"""Pallas shear kernel vs the XLA reference implementation (interpret mode on
CPU; the real kernel runs on TPU only)."""

import numpy as np

import jax
import jax.numpy as jnp

from deeplabv3plus_augmented_superresolution_tpu.ops.pallas_shear import (
    candidates_for,
    shear_rows_pallas,
)
from deeplabv3plus_augmented_superresolution_tpu.ops.shear_warp import _shear_rows


def _case(seed=0, n=3, h=64, w=64, coef=0.15, off=20.0):
    rng = np.random.default_rng(seed)
    images = rng.uniform(0, 1, (n, h, w)).astype(np.float32)
    coefs = rng.uniform(-coef, coef, n).astype(np.float32)
    offs = rng.uniform(-off, off, n).astype(np.float32)
    y = np.arange(h, dtype=np.float32)
    s = coefs[:, None] * (y[None, :] - h / 2) + offs[:, None]
    return jnp.asarray(images), jnp.asarray(s.astype(np.float32))


def test_pallas_shear_matches_xla_impl():
    images, s = _case()
    n_cand = candidates_for(0.15)
    ours = np.asarray(shear_rows_pallas(images, s, n_cand, True))
    ref = np.asarray(_shear_rows(images[..., None], s, 64))[..., 0]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pallas_shear_large_offsets():
    images, s = _case(seed=1, off=100.0)
    n_cand = candidates_for(0.15)
    ours = np.asarray(shear_rows_pallas(images, s, n_cand, True))
    ref = np.asarray(_shear_rows(images[..., None], s, 64))[..., 0]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pallas_shear_identity():
    images, _ = _case(seed=2)
    s = jnp.zeros((3, 64), jnp.float32)
    out = np.asarray(shear_rows_pallas(images, s, 3, True))
    np.testing.assert_allclose(out, np.asarray(images), atol=1e-6)


def test_pallas_shear_custom_vjp_matches_xla_grad():
    images, s = _case(seed=3)
    n_cand = candidates_for(0.15)

    g_pallas = jax.grad(
        lambda im: jnp.sum(shear_rows_pallas(im, s, n_cand, True) ** 2))(images)
    g_xla = jax.grad(
        lambda im: jnp.sum(_shear_rows(im[..., None], s, 64) ** 2))(images)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               atol=1e-4)
