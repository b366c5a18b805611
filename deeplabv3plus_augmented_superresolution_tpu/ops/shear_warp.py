"""Gather-free affine warp: rotation+translation as three shear passes.

Why this exists: XLA lowers gathers/scatters catastrophically on TPU — a
single fwd+bwd of the reference's rotate+translate on a (100, 512, 512, 1)
batch measured ~5.3 s on a v5e chip (and even row-contiguous slice gathers
run at <1 GB/s), which makes the 300-iteration SR solve (reference
superresolution.py:120-135) unrunnable. This module reformulates the warp:

  R(theta) = Sx(-tan(theta/2)) . Sy(sin theta) . Sx(-tan(theta/2))   (Paeth)

with the translation folded into the shear offsets. A shear shifts each row
by a constant fractional amount; we evaluate it with a *two-level tap blend*
over statically-shifted views — a coarse level in strides of _COARSE pixels
and a fine level covering the remainder plus the bilinear fraction:

  out = sum_q m_q(n,y) * sum_d w_d(n,y) * slab[..., q*_COARSE + d : ... + W]

Every slice is static, so the whole pass is dense pads/slices/FMAs that XLA
fuses and the VPU streams; tap count is K/_COARSE + _COARSE + 1 instead of K.
The adjoint of a constant-per-row fractional shift is the shift by the
negated amount, so backward is the same dense pass via jax.custom_vjp: no
scatter anywhere.

Numerics differ from the two-resample tfa path at the interpolation level
(three 1-D lerps vs two 2-D bilerps); masks/IoU agree — see
tests/test_shear_warp.py. The gather-based ops/warp.py remains the exact
tfa-semantics reference for CPU golden tests.
"""

import math
from functools import partial
import jax
import jax.numpy as jnp

# Static budget on |shift| per row (pixels): covers the workload's ranges
# (|tan(a/2)|*H/2 + |translation| for 512-px images, angles to ~0.7 rad,
# shifts to ~120 px). Shifts beyond it clamp to the budget edge, where the
# content is fully out of frame anyway.
_PAD = 256
_COARSE = 8


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _shear_rows(images: jnp.ndarray, s: jnp.ndarray, span: int) -> jnp.ndarray:
    """out[n, y, x, c] = lerp(images[n, y, x + s(n,y)]), zero fill.

    images: (N, H, W, C); s: (N, H) per-row shifts (sample coordinate
    offsets); span: static bound on (max_y s - min_y s) per copy — the
    row-to-row shift variation (the per-copy constant part is handled by one
    dynamic whole-plane slice and is budgeted by _PAD).
    """
    return _shear_rows_impl(images, s, span)


def _shear_rows_impl(images: jnp.ndarray, s: jnp.ndarray, span: int) -> jnp.ndarray:
    n, h, w, c = images.shape
    dtype = images.dtype
    n_coarse = int(math.ceil((span + _COARSE + 2) / _COARSE)) + 1
    s = jnp.clip(s, -_PAD + 1, _PAD - 2)
    # Per-copy rebase so the static tap levels only span this copy's
    # row-to-row variation (the translation component is constant per copy).
    base = jnp.floor(s.min(axis=1, keepdims=True) / _COARSE) * _COARSE  # (N,1)
    r = s - base                                   # in [0, span + _COARSE)

    q = jnp.floor(r / _COARSE).astype(jnp.int32)                # coarse index
    rem = r - q.astype(jnp.float32) * _COARSE                   # [0, _COARSE)
    d = jnp.floor(rem).astype(jnp.int32)                        # fine index
    t = (rem - d.astype(jnp.float32)).astype(dtype)             # fraction

    base_i = base.astype(jnp.int32) + _PAD                      # (N, 1)
    slab_w = w + (n_coarse - 1) * _COARSE + _COARSE + 2
    padded = jnp.pad(images, ((0, 0), (0, 0), (_PAD, _PAD + slab_w - w), (0, 0)))
    # One dynamic, per-copy, whole-plane slice (N slices only — cheap), then
    # purely static taps.
    slab = jax.vmap(
        lambda img, b: jax.lax.dynamic_slice_in_dim(img, b[0], slab_w, axis=1)
    )(padded, base_i)                                           # (N,H,slab_w,C)

    # Fine level: 2-tap lerp folded into (_COARSE+1) static-shift weights.
    fine_w = w + (n_coarse - 1) * _COARSE
    fine = jnp.zeros((n, h, fine_w, c), dtype)
    for k in range(_COARSE + 1):
        wk = jnp.where(d == k, 1.0 - t, 0.0) + jnp.where(d == k - 1, t, 0.0)
        fine = fine + wk[..., None, None] * slab[:, :, k:k + fine_w]

    # Coarse level: select the right _COARSE-strided window per row.
    out = jnp.zeros((n, h, w, c), dtype)
    for qi in range(n_coarse):
        mq = (q == qi).astype(dtype)[..., None, None]
        out = out + mq * fine[:, :, qi * _COARSE: qi * _COARSE + w]
    return out


def _shear_rows_fwd(images, s, span):
    return _shear_rows_impl(images, s, span), (s,)


def _shear_rows_bwd(span, res, g):
    (s,) = res
    # Adjoint of the constant-per-row 2-tap shift T(s) is T(-s): for
    # out[x] = (1-t) in[x+f] + t in[x+f+1], the transpose scatters each
    # cotangent with the same weights, which re-reads as a shift by -s.
    return _shear_rows_impl(g, -s, span), jnp.zeros_like(s)


_shear_rows.defvjp(_shear_rows_fwd, _shear_rows_bwd)


def _pallas_available() -> bool:
    import os

    if os.environ.get("DSR_DISABLE_PALLAS"):
        return False
    try:
        ok = jax.devices()[0].platform not in ("cpu", "gpu")
    except Exception:
        return False
    if ok:
        # The axon remote-compile helper for Pallas/Mosaic needs these
        # identifiers. Set here — after the backend is known — rather than at
        # library import: defaulting TPU_WORKER_ID=0/hostnames=localhost
        # globally could poison a real multi-host bring-up that discovers its
        # topology elsewhere (setdefault never overrides a launcher's values).
        os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
        os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
        os.environ.setdefault("TPU_WORKER_ID", "0")
    return ok


def _pallas_self_test() -> bool:
    """One-time compiled-vs-XLA agreement check on a tiny shear.

    The TPU toolchain has a history of silent miscompiles in exactly this
    kernel's territory (dynamic lane ops: NOTES.md records two — misaligned
    dynamic lane slices reading zeros, and dynamic negative pltpu.roll shifts
    zeroing the output). A wrong warp corrupts every downstream SR result
    while remaining plausible-looking, so the first Pallas use pays a ~1 s
    compile to prove the installed stack against the XLA reference; on
    mismatch we warn and fall back to the (slower, correct) XLA path.
    """
    import warnings

    import numpy as np

    from .pallas_shear import BLOCK_ROWS, shear_rows_pallas

    try:
        rng = np.random.default_rng(0)
        h, w = BLOCK_ROWS, 128
        img = jnp.asarray(rng.uniform(0, 1, (1, h, w)).astype(np.float32))
        s = jnp.asarray((np.linspace(-2.0, 2.0, h)[None, :] - 7.25)
                        .astype(np.float32))
        got = np.asarray(shear_rows_pallas(img, s, 8))
        want = np.asarray(_shear_rows(img[..., None], s, 8))[..., 0]
        # Second probe at the shift-budget edge: wide rows, |s| ~ 240 — the
        # regime where a kernel/XLA budget mismatch silently corrupts warps
        # at the CLI-default extremes (angle 0.5, shifts +-80). One copy near
        # +240, one near -239 (per-copy rebasing both ways).
        img2 = jnp.asarray(rng.uniform(0, 1, (2, h, 512)).astype(np.float32))
        ramp = np.linspace(-1.0, 1.0, h, dtype=np.float32)
        s2 = jnp.asarray(np.stack([ramp + 240.25, ramp - 239.5]))
        got2 = np.asarray(shear_rows_pallas(img2, s2, 8))
        want2 = np.asarray(_shear_rows(img2[..., None], s2, 8))[..., 0]
        if not (np.allclose(got, want, atol=1e-5)
                and np.allclose(got2, want2, atol=1e-5)):
            err = max(float(np.abs(got - want).max()),
                      float(np.abs(got2 - want2).max()))
            warnings.warn(
                "Pallas shear kernel disagrees with the XLA reference on this "
                f"backend (max err {err:.3g}); falling back to the "
                "XLA shear path. Set DSR_DISABLE_PALLAS=1 to silence.")
            return False
        return True
    except Exception as exc:  # compile/runtime failure -> fall back
        warnings.warn(f"Pallas shear kernel unavailable ({exc!r}); using the "
                      "XLA shear path.")
        return False


_USE_PALLAS = None


def _use_pallas() -> bool:
    global _USE_PALLAS
    if _USE_PALLAS is None:
        ok = _pallas_available()
        if ok:
            # The first consult usually happens while tracing a caller's jit;
            # JAX trace state is thread-local, so run the probe in a fresh
            # thread to execute it for real instead of staging it.
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=1) as pool:
                ok = pool.submit(_pallas_self_test).result()
        _USE_PALLAS = ok
    return _USE_PALLAS


def shear_rows_dispatch(images: jnp.ndarray, s: jnp.ndarray, span: int,
                        n_cand: int) -> jnp.ndarray:
    """Per-row fractional x-shift of (N, H, W) images by s (N, H): the Pallas
    kernel when available and the shape fits its blocking, else the XLA
    two-level blend. Differentiable in images (shift adjoint), s is treated
    as a constant."""
    n, h, w = images.shape
    s = jax.lax.stop_gradient(s)
    from .pallas_shear import BLOCK_ROWS
    if _use_pallas() and h % BLOCK_ROWS == 0 and w % 8 == 0:
        from .pallas_shear import shear_rows_pallas

        return shear_rows_pallas(images, s, n_cand)
    return _shear_rows(images[..., None], s, span)[..., 0]


def _shear_pass_x(images: jnp.ndarray, coef: jnp.ndarray, offset: jnp.ndarray,
                  center: float, span: int, n_cand: int,
                  interpolation: str = "bilinear") -> jnp.ndarray:
    """Row shift s(n, y) = coef[n] * (y - center) + offset[n].

    interpolation="nearest" rounds each row's shift to an integer, so the
    2-tap lerp degenerates to exact single-tap selection (weights are exactly
    {0, 1}) — no blending, output values are a subset of input values. Used
    for label/GT images (reference warps GT with nearest,
    check_robustness.py:47-50).
    """
    n, h, w, c = images.shape
    y = jnp.arange(h, dtype=jnp.float32)
    s = coef[:, None] * (y[None, :] - center) + offset[:, None]
    if interpolation == "nearest":
        s = jnp.round(s)
    s = jax.lax.stop_gradient(s)
    from .pallas_shear import BLOCK_ROWS
    if _use_pallas() and h % BLOCK_ROWS == 0 and w % 8 == 0:
        from .pallas_shear import shear_rows_pallas

        flat = jnp.moveaxis(images, 3, 1).reshape(n * c, h, w)
        s_rep = jnp.repeat(s, c, axis=0) if c > 1 else s
        out = shear_rows_pallas(flat, s_rep, n_cand)
        return jnp.moveaxis(out.reshape(n, c, h, w), 1, 3)
    return _shear_rows(images, s, span)


def _shear_pass_y(images: jnp.ndarray, coef: jnp.ndarray, offset: jnp.ndarray,
                  center: float, span: int, n_cand: int,
                  interpolation: str = "bilinear") -> jnp.ndarray:
    swapped = jnp.swapaxes(images, 1, 2)
    out = _shear_pass_x(swapped, coef, offset, center, span, n_cand,
                        interpolation)
    return jnp.swapaxes(out, 1, 2)


def shear_taps(angle_max: float, size: int) -> int:
    """Static bound on a shear pass's row-shift variation (span) for
    |angle| <= angle_max on a size-px axis."""
    coef = max(abs(math.tan(angle_max / 2.0)), abs(math.sin(angle_max)))
    return int(math.ceil(coef * size)) + 3


@partial(jax.jit, static_argnames=("angle_max", "interpolation"))
def paeth_rotate_translate(images: jnp.ndarray, angles: jnp.ndarray,
                           shifts: jnp.ndarray,
                           angle_max: float = 0.35,
                           interpolation: str = "bilinear") -> jnp.ndarray:
    """tfa-style rotate(angles) followed by translate(shifts), as shears.

    images: (N, H, W) or (N, H, W, C); angles (N,) rad CCW; shifts (N, 2)
    as (dx, dy) pixels. angle_max is a STATIC bound on |angles| sizing the
    static tap windows (larger is correct but slower).

    interpolation="nearest" rounds each shear pass's row shift, making the
    warp a pure pixel permutation-with-fill: output labels are a subset of
    input labels (use for GT masks). Geometry differs from a single-resample
    nearest warp by at most the per-pass rounding (<~1.5 px), with no label
    blending anywhere.
    """
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

    am = angle_max if angle_max > 0 else 1e-3
    span_x = shear_taps(am, h)
    span_y = shear_taps(am, w)
    from .pallas_shear import candidates_for
    coef_max = max(abs(math.tan(am / 2.0)), abs(math.sin(am)))
    n_cand = candidates_for(coef_max)

    out = _shear_pass_x(images, a, off_a, cy, span_x, n_cand, interpolation)
    out = _shear_pass_y(out, b, off_b, cx, span_y, n_cand, interpolation)
    out = _shear_pass_x(out, a, off_c, cy, span_x, n_cand, interpolation)
    return out[..., 0] if squeeze else out


@partial(jax.jit, static_argnames=("angle_max", "interpolation"))
def paeth_inverse_rotate_translate(images: jnp.ndarray, angles: jnp.ndarray,
                                   shifts: jnp.ndarray,
                                   angle_max: float = 0.35,
                                   interpolation: str = "bilinear") -> jnp.ndarray:
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
    return paeth_rotate_translate(images, -angles, -rot_d, angle_max,
                                  interpolation)
