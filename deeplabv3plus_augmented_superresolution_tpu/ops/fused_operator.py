"""Fused warp+downsample forward operator A_i(x) = D(W_i(x)) for the SR solve.

The reference evaluates the operator as materialize-100-HR-warps then resize
(superresolution.py:59-68). This module computes the same composition without
ever materializing full-resolution warped copies, by folding TF-bilinear
decimation (512->128 = 2x2 average at stride 4, offset +1) into the Paeth
shear chain:

  pass A: x-shear at full resolution (the Pallas shear kernel on TPU).
  pass B: y-shear fused with y-decimation: output has 128 rows per copy.
  pass C: x-shear fused with x-decimation: output is the 128x128 LR map.

Sizes per copy: (512,512) -> (128,512) -> (128,128); B and C are cheap
static-strided tap blends. Everything is dense slices/matmuls/FMAs (no
gather/scatter), differentiable by autodiff (slice adjoints are pads,
einsum adjoints are matmuls).

This computes D . W_single-resample: identical to the reference up to the
(already accepted) single-vs-double resample interpolation difference of the
shear warp; tests/test_fused_operator.py quantifies agreement and SR-recovery
quality.

STATUS: experimental. Numerically validated, but on the current axon/XLA
stack the decimating passes' strided-slice chains lower poorly (measured ~10x
slower than the staged Pallas path in the solve loop) — the staged operator
(solver.py operator_impl="staged") is the production default. The intended
endgame is a single Pallas kernel for the B/C decimating passes; see NOTES.md.
"""

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_DEC = 4          # decimation factor 512 -> 128
_PAD = 256        # static |shift| budget (pixels) for every pass


def _tap_weights_lerp(r: jnp.ndarray, k_taps: int) -> jnp.ndarray:
    """(..., K) 2-tap lerp weights for continuous offsets r in [0, k_taps-1)."""
    f = jnp.floor(r)
    t = (r - f)[..., None]
    f = f.astype(jnp.int32)[..., None]
    ks = jnp.arange(k_taps)
    return jnp.where(f == ks, 1.0 - t, 0.0) + jnp.where(f == ks - 1, t, 0.0)


def _tap_weights_decimated(r: jnp.ndarray, k_taps: int) -> jnp.ndarray:
    """(..., K) weights of the 2x2-average TF decimation composed with a
    fractional shift r: taps 0.5(1-t) @ f+1, 0.5 @ f+2, 0.5t @ f+3."""
    f = jnp.floor(r)
    t = (r - f)[..., None]
    f = f.astype(jnp.int32)[..., None]
    ks = jnp.arange(k_taps)
    return (jnp.where(f == ks - 1, 0.5 * (1.0 - t), 0.0)
            + jnp.where(f == ks - 2, 0.5, 0.0)
            + jnp.where(f == ks - 3, 0.5 * t, 0.0))


def _decimating_shear(images: jnp.ndarray, s: jnp.ndarray, span: int) -> jnp.ndarray:
    """Pass B/C core: per-row shift + 4x decimation along the last axis.

    images: (N, H, W); s: (N, H) continuous shifts; returns (N, H, W//4) with
    out[n,y,xl] = sum_j w_j(n,y) * imagepad[n, y, 4*xl + base_n + j], where w
    are the decimated-lerp taps. All slices static except one whole-plane
    dynamic slice per copy.
    """
    n, h, w = images.shape
    wl = w // _DEC
    s = jnp.clip(s, -_PAD + 1, _PAD - span - 8)
    base = jnp.floor(s.min(axis=1))                         # (N,)
    r = s - base[:, None]                                   # [0, span+1)
    k_taps = span + 8
    weights = _tap_weights_decimated(r, k_taps)             # (N, H, K)
    weights = jax.lax.stop_gradient(weights)

    base_i = base.astype(jnp.int32) + _PAD
    slab_w = (wl - 1) * _DEC + k_taps + 1
    padded = jnp.pad(images, ((0, 0), (0, 0), (_PAD, _PAD + slab_w)))
    slab = jax.vmap(
        lambda img, b: jax.lax.dynamic_slice_in_dim(img, b, slab_w, axis=1)
    )(padded, base_i)                                       # (N, H, slab_w)

    out = jnp.zeros((n, h, wl), jnp.float32)
    for j in range(k_taps):
        sl = jax.lax.slice(slab, (0, 0, j), (n, h, j + (wl - 1) * _DEC + 1),
                           (1, 1, _DEC))                    # (N, H, wl)
        out = out + weights[..., j:j + 1] * sl
    return out


def am_coef(angle_max: float) -> float:
    """x-shear coefficient bound for |angle| <= angle_max."""
    return math.tan(max(angle_max, 1e-3) / 2.0)


def fused_taps(angle_max: float, size: int) -> Tuple[int, int]:
    """(span for the y pass, span for the final x pass) shift variations."""
    a = abs(math.tan(angle_max / 2.0))
    b = abs(math.sin(angle_max))
    return int(math.ceil(b * size)) + 3, int(math.ceil(a * size)) + 3


@partial(jax.jit, static_argnames=("feature_size", "angle_max"))
def fused_warp_downsample(target: jnp.ndarray, angles: jnp.ndarray,
                          shifts: jnp.ndarray,
                          feature_size: Tuple[int, int] = (128, 128),
                          angle_max: float = 0.35) -> jnp.ndarray:
    """A_i(x): rotate+translate (tfa convention) then TF-bilinear downsample,
    per copy, without materializing HR warped copies.

    target: (1, H, W, 1) or (H, W); returns (N, h, w, 1).
    """
    squeeze_in = target.ndim == 2
    img = target if squeeze_in else target[0, :, :, 0]
    h, w = img.shape
    hl, wl = feature_size
    if (h // hl != _DEC) or (w // wl != _DEC):
        raise ValueError("fused operator supports 4x decimation only")
    n = angles.shape[0]
    cx = (w - 1) / 2.0
    cy = (h - 1) / 2.0

    angles = angles.astype(jnp.float32)
    dx = shifts[:, 0].astype(jnp.float32)
    dy = shifts[:, 1].astype(jnp.float32)
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    a = -jnp.tan(angles / 2.0)
    b = sin

    tx = cos * (-dx) - sin * (-dy) + (cx - (cos * cx - sin * cy))
    ty = sin * (-dx) + cos * (-dy) + (cy - (sin * cx + cos * cy))
    off_a = tx - a * ty + a * cy      # pass A x offset (coef a on y - cy)
    off_b = ty + b * cx               # pass B y offset (coef b on x - cx)
    off_c = a * cy                    # pass C x offset (coef a on y - cy)

    am = max(angle_max, 1e-3)
    span_b, span_c = fused_taps(am, max(h, w))

    # ---- pass A: x-shear at full resolution ----
    from .pallas_shear import candidates_for
    from .shear_warp import _shear_pass_x, shear_taps

    n_cand = candidates_for(max(abs(math.tan(am_coef(angle_max))), 1e-3))
    span_a = shear_taps(max(angle_max, 1e-3), h)
    batched = jnp.broadcast_to(img[None, :, :, None], (n, h, w, 1))
    i1 = _shear_pass_x(batched, a, off_a, cy, span_a, n_cand)[..., 0]

    # ---- pass B: y-shear + y-decimation ----
    x_coords = jnp.arange(w, dtype=jnp.float32)
    s_b = b[:, None] * (x_coords[None, :] - cx) + off_b[:, None]  # (N, W)
    i1_t = jnp.swapaxes(i1, 1, 2)                            # (N, W, H)
    i2_t = _decimating_shear(i1_t, s_b, span_b)              # (N, W, hl)
    i2 = jnp.swapaxes(i2_t, 1, 2)                            # (N, hl, W)

    # ---- pass C: x-shear + x-decimation (shift at decimated y coords) ----
    yl_coords = _DEC * jnp.arange(hl, dtype=jnp.float32) + 1.5
    s_c = a[:, None] * (yl_coords[None, :] - cy) + off_c[:, None]  # (N, hl)
    out = _decimating_shear(i2, s_c, span_c)                 # (N, hl, wl)
    return out[..., None]
