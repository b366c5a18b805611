"""TF-semantics image resize, formulated as matrix multiplies for the MXU.

The reference pipeline leans on ``tf.image.resize`` (half-pixel centers, no
antialiasing) in four hot places: the final x4 model upsample
(reference model.py:108-111), the ASPP image-pooling upsample
(model.py:203-204), the SR downsampling operator D (reference
superresolution_scripts/superresolution.py:67-68) and the copy upsampling in
max/mean SR (superresolution.py:140-141). IoU parity hinges on matching those
numerics, so this module reproduces TF's coordinate mapping exactly:

  bilinear: src = max(0, (dst + 0.5) * (in/out) - 0.5); lerp of floor/ceil
            with ceil clamped to in-1.
  nearest:  src = min(floor((dst + 0.5) * (in/out)), in - 1).

Rather than gather-based sampling (scalar-ish and VPU-bound on TPU), the
separable resample is expressed as two dense matmuls with precomputed
interpolation matrices:  out = M_h @ img @ M_w^T.  For the sizes in this
workload (512<->128) the matrices are tiny, constant-folded by XLA, and the
contraction runs on the MXU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _resize_matrix_np(out_size: int, in_size: int, method: str) -> np.ndarray:
    """Dense (out_size, in_size) interpolation matrix, built on host once."""
    dst = np.arange(out_size, dtype=np.float64)
    scale = in_size / out_size
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    if method == "bilinear":
        src = np.maximum((dst + 0.5) * scale - 0.5, 0.0)
        lo = np.floor(src).astype(np.int64)
        lo = np.minimum(lo, in_size - 1)
        hi = np.minimum(lo + 1, in_size - 1)
        frac = src - lo
        np.add.at(mat, (dst.astype(np.int64), lo), 1.0 - frac)
        np.add.at(mat, (dst.astype(np.int64), hi), frac)
    elif method == "nearest":
        src = np.minimum(np.floor((dst + 0.5) * scale), in_size - 1).astype(np.int64)
        mat[dst.astype(np.int64), src] = 1.0
    else:
        raise ValueError(f"Unsupported resize method: {method!r}")
    return mat.astype(np.float32)


def resize_matrix(out_size: int, in_size: int, method: str = "bilinear") -> jnp.ndarray:
    """Interpolation matrix M with ``out_row = M @ in_row`` (TF semantics)."""
    return jnp.asarray(_resize_matrix_np(int(out_size), int(in_size), method))


def resize(x: jnp.ndarray, size, method: str = "bilinear") -> jnp.ndarray:
    """Resize NHWC / HWC / (..., H, W, C) images to ``size`` (h, w).

    Matches ``tf.image.resize(x, size, method=method)`` for methods
    "bilinear" and "nearest" (TF2 defaults: half_pixel_centers=True,
    antialias=False). Output dtype is float32 for bilinear (as in TF) and the
    input dtype for nearest.
    """
    out_h, out_w = int(size[0]), int(size[1])
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (in_h, in_w) == (out_h, out_w):
        return x.astype(jnp.float32) if method == "bilinear" else x

    if method == "nearest":
        # Pure gather keeps integer dtypes intact (used for GT label masks).
        rows = np.minimum(
            np.floor((np.arange(out_h) + 0.5) * (in_h / out_h)), in_h - 1
        ).astype(np.int32)
        cols = np.minimum(
            np.floor((np.arange(out_w) + 0.5) * (in_w / out_w)), in_w - 1
        ).astype(np.int32)
        return x[..., rows, :, :][..., :, cols, :]

    mh = resize_matrix(out_h, in_h, method)
    mw = resize_matrix(out_w, in_w, method)
    orig_dtype = x.dtype
    compute = jnp.float32 if orig_dtype != jnp.bfloat16 else jnp.bfloat16
    # HIGHEST keeps f32 MXU passes for parity with the TF reference; bf16
    # inputs opt into fast bf16 matmuls explicitly.
    prec = jax.lax.Precision.HIGHEST if compute == jnp.float32 else jax.lax.Precision.DEFAULT
    y = jnp.einsum("oh,...hwc->...owc", mh, x.astype(compute),
                   preferred_element_type=compute, precision=prec)
    y = jnp.einsum("pw,...owc->...opc", mw, y,
                   preferred_element_type=compute, precision=prec)
    return y
