"""Pallas TPU kernel for the per-row fractional shear (the SR hot op).

One shear pass shifts each image row by s(n, y) pixels with 2-tap lerp and
zero fill — the building block of the Paeth warp (ops/shear_warp.py) that the
SR solve executes 6x per optimization step (3 passes forward + 3 adjoint).

Kernel strategy (per (copy, 128-row block) grid step, all VMEM-resident):
  1. one dynamic lane-rotate of the padded block by the block's common
     integer shift (pltpu.roll — per-row integer offsets within a block
     differ by at most ceil(block_rows*|coef|) because shifts are linear
     in y);
  2. a TWO-LEVEL tap blend of the per-row residual offsets: a fine level of
     (_COARSE + 1) per-row-weighted shifts (the 2-tap lerp folded into the
     weights) over a slightly widened strip, then ~residual/_COARSE coarse
     window selects.

This keeps the tap loop at ~(_COARSE + residual/_COARSE) full-width FMAs
instead of the full shear range (~80 at 512 px), and everything between HBM
reads/writes is VPU work on VMEM. The adjoint of a constant-per-row
fractional shift is the shift by -s, so backward reuses the same kernel via
jax.custom_vjp.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lane padding on each side of the row: bounds |shift| (clamped beyond).
# 256 matches the XLA shear path's budget (shear_warp._PAD, +-254 px), which
# the workload's composed shear offsets reach at the CLI-default extremes
# (angle_max 0.5 with +-80 px translations); it also keeps the padded width
# a multiple of 128.
PAD = 256
# 128-row blocks measured fastest (block-scheduling overhead amortizes and
# the two-level tap blend keeps the candidate loop small regardless of the
# per-block shift span).
BLOCK_ROWS = 128
# Coarse stride of the two-level tap blend: the candidate loop costs
# (_COARSE + 1) fine FMAs plus ~n_cand/_COARSE coarse selects per element
# instead of n_cand selects.
_COARSE = 8


def _kernel(s_ref, in_ref, out_ref, *, width: int, n_cand: int,
            block_rows: int):
    """s_ref: (1, 1, H) SMEM; in_ref: (1, block_rows, Wp) VMEM block;
    out_ref: (1, block_rows, W). n_cand statically bounds the row-to-row
    integer-shift span within a block (+1 for the lerp tap)."""
    n_coarse = (n_cand + _COARSE) // _COARSE + 1
    span = n_coarse * _COARSE
    blk = pl.program_id(1)
    row0 = blk * block_rows

    # Mosaic's dynamic rotate is 32-bit only: compute in f32, with bf16 (if
    # any) kept at the HBM boundary.
    rows = in_ref[0].astype(jnp.float32)                 # (BR, Wp)

    # Per-row shifts for this block.
    f_list = []
    t_list = []
    for r in range(block_rows):
        sr = s_ref[0, 0, row0 + r]
        fr = jnp.floor(sr)
        f_list.append(fr.astype(jnp.int32))
        t_list.append(sr - fr)
    f = jnp.stack(f_list)                                # (BR,) int32
    t = jnp.stack(t_list)[:, None]                       # (BR, 1) f32

    base = jnp.clip(jnp.min(f), -PAD, PAD - span - 2)
    delta = jnp.clip(f - base, 0, span - 1)              # (BR,)
    q = (delta // _COARSE)[:, None]                      # coarse window
    d = (delta % _COARSE)[:, None]                       # fine offset

    # Sample x + s -> padded index x + f + PAD; after rotating left by
    # (base + PAD), candidate j needs rolled[:, x + j] (+1 for the lerp tap).
    # pltpu.roll is a RIGHT-roll and a dynamic negative shift silently
    # miscompiles to zeros on this Mosaic stack, so express the left-roll as
    # its positive complement modulo the padded width.
    wp = rows.shape[-1]
    rolled = pltpu.roll(rows, (wp - (base + PAD)) % wp, 1)

    # Fine level: the 2-tap lerp folded into (_COARSE + 1) per-row weights
    # over a (width + coarse-span)-wide strip.
    fine_w = width + (n_coarse - 1) * _COARSE
    fine = jnp.zeros((block_rows, fine_w), jnp.float32)
    for k in range(_COARSE + 1):
        wk = jnp.where(d == k, 1.0 - t, 0.0) + jnp.where(d == k - 1, t, 0.0)
        fine = fine + wk * rolled[:, k:k + fine_w]

    # Coarse level: select each row's _COARSE-strided window.
    acc = jnp.zeros((block_rows, width), jnp.float32)
    for qi in range(n_coarse):
        sel = (q == qi).astype(jnp.float32)
        acc = acc + sel * fine[:, qi * _COARSE: qi * _COARSE + width]
    out_ref[0] = acc.astype(out_ref.dtype)


def _shear_rows_pallas_impl(images: jnp.ndarray, s: jnp.ndarray,
                            n_cand: int, interpret: bool = False) -> jnp.ndarray:
    """images: (N, H, W) f32/bf16; s: (N, H) f32 -> (N, H, W) same dtype."""
    n, h, w = images.shape
    wp = w + 2 * PAD
    br = min(BLOCK_ROWS, h)
    padded = jnp.pad(images, ((0, 0), (0, 0), (PAD, PAD)))
    kernel = functools.partial(_kernel, width=w, n_cand=n_cand,
                               block_rows=br)
    return pl.pallas_call(
        kernel,
        grid=(n, h // br),
        in_specs=[
            pl.BlockSpec((1, 1, h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, br, wp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, br, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), images.dtype),
        interpret=interpret,
    )(s.reshape(n, 1, h), padded)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def shear_rows_pallas(images: jnp.ndarray, s: jnp.ndarray, n_cand: int,
                      interpret: bool = False) -> jnp.ndarray:
    """out[n, y, x] = lerp(images[n, y, x + s(n, y)]), zero fill (Pallas)."""
    return _shear_rows_pallas_impl(images, s, n_cand, interpret)


def _fwd(images, s, n_cand, interpret):
    return _shear_rows_pallas_impl(images, s, n_cand, interpret), (s,)


def _bwd(n_cand, interpret, res, g):
    (s,) = res
    return _shear_rows_pallas_impl(g, -s, n_cand, interpret), jnp.zeros_like(s)


shear_rows_pallas.defvjp(_fwd, _bwd)


def candidates_for(coef_max: float, block_rows: int = BLOCK_ROWS) -> int:
    """Static residual-candidate count: ceil(block_rows * |coef|) + 2."""
    return int(math.ceil(block_rows * abs(coef_max))) + 2
