"""Fused warp+downsample forward operator A_i(x) = D(W_i(x)) for the SR solve.

The reference evaluates the operator as materialize-100-HR-warps then resize
(superresolution.py:59-68). This module computes the same composition with
the decimations folded INTO the shear chain, so the second and third passes
shrink their working set:

  pass A: x-shear at full resolution (the Pallas shear kernel on TPU).
  pass B: y-shear followed by y-decimation: output has 128 rows per copy.
  pass C: x-shear at the decimated y coordinates + x-decimation: the final
          128x128 LR map, computed from a (128, 512) intermediate — 1/4 the
          rows of a staged pass.

Each decimating pass uses the identity

  dec(shift_s(x)) = Dec @ shift_s(x)

where shift_s is the per-row fractional 2-tap shift (the shear kernel) and
Dec is TF-bilinear 4x decimation = the fixed 2-tap stride-4 averaging matrix
(ops/resize.resize_matrix): composing the taps gives exactly the decimated
3-tap blend (0.5(1-t) @ f+1, 0.5 @ f+2, 0.5t @ f+3). The shift runs on the
proven shear kernel; the decimation is one small MXU matmul. Everything is
dense (no gather/scatter) and differentiable (shift adjoint = shift by -s,
matmul adjoint = transposed matmul).

Semantics: D . W_single-resample with pass C's shift evaluated at the
decimated y coordinates — identical to the staged operator up to that
<=0.1 px coordinate approximation plus the (already accepted) single-vs-
double-resample interpolation difference of the shear warp;
tests/test_fused_operator.py quantifies agreement and SR-recovery quality.
Its Gram support is STRICTLY SMALLER than the staged operator's
(dx in [-3, 3] vs [-4, 4] — pass C's 3 decimated taps replace the staged
path's lerp-then-resize spread), which is what lets the gram solver probe it
with a (3, 3)-radius stencil (ops/gram.py).
"""

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_PAD = 256        # static |shift| budget (pixels) for every pass


def _decimating_shear(images: jnp.ndarray, s: jnp.ndarray, span: int,
                      n_cand: int, out_size: int) -> jnp.ndarray:
    """Per-row fractional shift + TF-bilinear decimation along the last axis.

    images: (N, H, W); s: (N, H) continuous shifts; returns (N, H, out_size).
    Factored as full-width shift (shear kernel) then the fixed decimation
    matmul — see module docstring for the tap identity. Any downsampling
    ratio (the matrix is ops/resize.resize_matrix).
    """
    from .resize import resize_matrix
    from .shear_warp import shear_rows_dispatch

    n, h, w = images.shape
    # Clip to the dispatch path's |shift| budget, same as shear_warp._shear_rows.
    # `span` only bounds per-copy row-to-row VARIATION (it sizes the static tap
    # windows), not shift magnitude — clipping by `_PAD - span - ...` wrongly
    # clamped every positive pass-B shift at angle_max >= ~0.35 (span_b ~ 170+),
    # corrupting the production forward operator. See tests/test_fused_operator.py
    # test_fused_matches_staged_at_production_extremes.
    s = jnp.clip(s, -_PAD + 1, _PAD - 2)
    shifted = shear_rows_dispatch(images, s, span, n_cand)
    dmat = resize_matrix(out_size, w, "bilinear")
    # HIGHEST keeps the f32 MXU path: the decimation is part of the solve
    # operator, whose Gram stencil is extracted to ~1e-5 exactness.
    return jnp.einsum("nhw,lw->nhl", shifted, dmat,
                      precision=jax.lax.Precision.HIGHEST)


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
    per copy, with decimation fused into the shear chain.

    target: (1, H, W, 1) or (H, W); returns (N, h, w, 1).
    """
    squeeze_in = target.ndim == 2
    img = target if squeeze_in else target[0, :, :, 0]
    h, w = img.shape
    hl, wl = feature_size
    if hl > h or wl > w:
        raise ValueError("fused operator is a downsampling operator")
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

    coef_a = abs(math.tan(am / 2.0))
    coef_b = abs(math.sin(am))
    span_a = shear_taps(am, h)
    n_cand_a = candidates_for(max(coef_a, coef_b))
    batched = jnp.broadcast_to(img[None, :, :, None], (n, h, w, 1))
    i1 = _shear_pass_x(batched, a, off_a, cy, span_a, n_cand_a)[..., 0]

    # ---- pass B: y-shear + y-decimation (transposed to row-shift form) ----
    x_coords = jnp.arange(w, dtype=jnp.float32)
    s_b = b[:, None] * (x_coords[None, :] - cx) + off_b[:, None]  # (N, W)
    i1_t = jnp.swapaxes(i1, 1, 2)                            # (N, W, H)
    i2_t = _decimating_shear(i1_t, s_b, span_b,
                             candidates_for(coef_b), hl)     # (N, W, hl)
    i2 = jnp.swapaxes(i2_t, 1, 2)                            # (N, hl, W)

    # ---- pass C: x-shear + x-decimation. The shift is evaluated at the
    # decimated y sample positions (TF half-pixel mapping), so the row-to-row
    # slope is ratio_y times the HR slope — hence the scaled candidate bound.
    ratio_y = h / hl
    yl_coords = (jnp.arange(hl, dtype=jnp.float32) + 0.5) * ratio_y - 0.5
    s_c = a[:, None] * (yl_coords[None, :] - cy) + off_c[:, None]  # (N, hl)
    out = _decimating_shear(i2, s_c, span_c,
                            candidates_for(ratio_y * coef_a), wl)  # (N,hl,wl)
    return out[..., None]
