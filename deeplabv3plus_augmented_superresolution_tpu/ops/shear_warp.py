"""Gather-free affine warp: rotation+translation as three shear passes.

Why this exists: XLA lowers per-element gathers/scatters catastrophically on
TPU — a single fwd+bwd of the reference's rotate+translate on a
(100, 512, 512, 1) batch measured ~5.3 s on a v5e chip, which makes the
300-iteration SR solve (reference superresolution.py:120-135) unrunnable.
This module reformulates the warp:

  R(theta) = Sx(-tan(theta/2)) . Sy(sin theta) . Sx(-tan(theta/2))   (Paeth)

with the translation folded into the shear offsets. A shear shifts each row
by a constant fractional amount, which is one *row-contiguous* dynamic slice
plus a 2-tap lerp — a memory pattern XLA lowers to near-roofline on TPU
(measured 0.04 ms for a (100, 512, 512) pass vs 259 ms for its autodiff
scatter). The adjoint of a constant-per-row fractional shift is the shift by
the negated amount, so the backward pass is defined via jax.custom_vjp as
another row-slice shear: no scatter anywhere.

Numerics differ from the two-resample tfa path at the interpolation level
(three 1-D lerps vs two 2-D bilerps); masks/IoU agree — see
tests/test_shear_warp.py. The gather-based ops/warp.py remains the exact
tfa-semantics reference for CPU golden tests.
"""

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# Static half-width of the zero padding around the x axis of a shear pass.
# Bounds the representable |shift| per row; shifts beyond it clamp (the
# content is fully out of frame for the workload's parameter ranges anyway).
_PAD = 256


@partial(jax.custom_vjp, nondiff_argnums=())
def _shear_rows(images: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """out[n, y, x, c] = lerp(images[n, y, x + s(n,y)]), zero fill.

    images: (N, H, W, C); s: (N, H) per-row shifts (sample coordinate offset).
    """
    return _shear_rows_impl(images, s)


def _shear_rows_impl(images: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = images.shape
    f = jnp.floor(s)
    t = (s - f).astype(images.dtype)[..., None, None]          # (N, H, 1, 1)
    starts = jnp.clip(f.astype(jnp.int32) + _PAD, 0, 2 * _PAD - 1)
    padded = jnp.pad(images, ((0, 0), (0, 0), (_PAD, _PAD), (0, 0)))

    def row_slice(row, st):                                     # (Wp, C), ()
        return jax.lax.dynamic_slice(row, (st, 0), (w + 1, c))

    sl = jax.vmap(jax.vmap(row_slice))(padded, starts)          # (N, H, W+1, C)
    return (1.0 - t) * sl[:, :, :w] + t * sl[:, :, 1:]


def _shear_rows_fwd(images, s):
    return _shear_rows_impl(images, s), (s,)


def _shear_rows_bwd(res, g):
    (s,) = res
    # Adjoint of the constant-per-row 2-tap shift T(s) is T(-s): for
    # out[x] = (1-t) in[x+f] + t in[x+f+1], the transpose scatters each
    # cotangent with the same weights, which re-reads as a shift by -s.
    return _shear_rows_impl(g, -s), jnp.zeros_like(s)


_shear_rows.defvjp(_shear_rows_fwd, _shear_rows_bwd)


def _shear_pass_x(images: jnp.ndarray, coef: jnp.ndarray, offset: jnp.ndarray,
                  center: float) -> jnp.ndarray:
    """Row shift s(n, y) = coef[n] * (y - center) + offset[n]."""
    h = images.shape[1]
    y = jnp.arange(h, dtype=jnp.float32)
    s = coef[:, None] * (y[None, :] - center) + offset[:, None]
    return _shear_rows(images, jax.lax.stop_gradient(s))


def _shear_pass_y(images: jnp.ndarray, coef: jnp.ndarray, offset: jnp.ndarray,
                  center: float) -> jnp.ndarray:
    swapped = jnp.swapaxes(images, 1, 2)
    out = _shear_pass_x(swapped, coef, offset, center)
    return jnp.swapaxes(out, 1, 2)


def shear_taps(angle_max: float, size: int) -> int:
    """Static bound on a shear pass's row-shift range for |angle|<=angle_max
    (kept for introspection; the row-slice formulation needs no tap loop)."""
    coef = max(abs(math.tan(angle_max / 2.0)), abs(math.sin(angle_max)))
    return int(math.ceil(coef * size)) + 3


@jax.jit
def paeth_rotate_translate(images: jnp.ndarray, angles: jnp.ndarray,
                           shifts: jnp.ndarray,
                           angle_max: float = 0.0) -> jnp.ndarray:
    """tfa-style rotate(angles) followed by translate(shifts), as shears.

    images: (N, H, W) or (N, H, W, C); angles (N,) rad CCW; shifts (N, 2)
    as (dx, dy) pixels. angle_max is accepted for API stability but unused
    (the row-slice formulation has a fixed static shift budget of _PAD px).
    """
    del angle_max
    squeeze = images.ndim == 3
    if squeeze:
        images = images[..., None]
    n, h, w = images.shape[:3]
    cx = (w - 1) / 2.0
    cy = (h - 1) / 2.0

    angles = angles.astype(jnp.float32)
    dx = shifts[:, 0].astype(jnp.float32)
    dy = shifts[:, 1].astype(jnp.float32)

    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    a = -jnp.tan(angles / 2.0)      # x-shear coefficient (both passes)
    b = sin                          # y-shear coefficient

    # Composite target map (output -> input), from the tfa transforms
    # (rotate about center then translate): p_in = R @ (p_out - d - c) + c
    # where R = [[cos, -sin], [sin, cos]], c = (cx, cy), d = (dx, dy).
    tx = cos * (-dx) - sin * (-dy) + (cx - (cos * cx - sin * cy))
    ty = sin * (-dx) + cos * (-dy) + (cy - (sin * cx + cos * cy))

    # Equating the shear-chain matrix product M_A M_B M_C (A applied first to
    # the image) against [R | (tx, ty)] with the g3=0 convention gives
    # x-offsets g1 = tx - a*ty, g2 = ty, g3 = 0, which in the
    # "coef*(axis - center) + offset" parametrization of the passes become:
    off_a = tx - a * ty + a * cy
    off_b = ty + b * cx
    off_c = a * cy

    out = _shear_pass_x(images, a, off_a, cy)
    out = _shear_pass_y(out, b, off_b, cx)
    out = _shear_pass_x(out, a, off_c, cy)
    return out[..., 0] if squeeze else out


@jax.jit
def paeth_inverse_rotate_translate(images: jnp.ndarray, angles: jnp.ndarray,
                                   shifts: jnp.ndarray,
                                   angle_max: float = 0.0) -> jnp.ndarray:
    """Inverse warp translate(-shifts) then rotate(-angles), i.e. the max/mean
    SR un-augmentation path (reference superresolution.py:139-161).

    Composing the two stages into one 3-shear chain: the image-op sequence
    [translate by -d, rotate by -theta] has the same composite affine map as
    [rotate by -theta, translate by -R(theta) d], which is a single
    paeth_rotate_translate call.
    """
    angles = jnp.asarray(angles, jnp.float32)
    shifts = jnp.asarray(shifts, jnp.float32)
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    dx, dy = shifts[:, 0], shifts[:, 1]
    rot_d = jnp.stack([cos * dx - sin * dy, sin * dx + cos * dy], axis=-1)
    return paeth_rotate_translate(images, -angles, -rot_d)
