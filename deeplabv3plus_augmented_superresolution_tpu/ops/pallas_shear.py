"""Pallas TPU kernel for the per-row fractional shear (the SR hot op).

One shear pass shifts each image row by s(n, y) pixels with 2-tap lerp and
zero fill — the building block of the Paeth warp (ops/shear_warp.py) that the
SR solve executes 6x per optimization step (3 passes forward + 3 adjoint).

Kernel strategy (per (copy, 8-row block) grid step, all VMEM-resident):
  1. one dynamic lane-rotate of the padded block by the block's common
     integer shift (pltpu.roll — per-row integer offsets within an 8-row
     block differ by at most ceil(8*|coef|) because shifts are linear in y);
  2. one full-width 2-tap lerp;
  3. a small static candidate-select loop over the per-row residual offsets.

This keeps the tap loop at the residual size (~4) instead of the full shear
range (~80 at 512 px), and everything between HBM reads/writes is VPU work on
VMEM. The adjoint of a constant-per-row fractional shift is the shift by -s,
so backward reuses the same kernel via jax.custom_vjp.
"""

import functools
import math
import os

# The axon remote-compile helper for Pallas/Mosaic needs these identifiers;
# they are harmless on other backends.
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
os.environ.setdefault("TPU_WORKER_ID", "0")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lane padding on each side of the row: bounds |shift| (clamped beyond).
# 192 covers the workload's composed shear offsets (|translate| <= ~120 plus
# the rotation term) and keeps the padded width a multiple of 128.
PAD = 192
# 32-row blocks measured ~2x faster than 8-row (per-block scalar work and
# roll setup amortize); the residual-candidate count grows with block size
# but stays small for the workload's angles.
BLOCK_ROWS = 32


def _kernel(s_ref, in_ref, out_ref, *, width: int, n_cand: int):
    """s_ref: (1, 1, H) SMEM; in_ref: (1, BLOCK_ROWS, Wp) VMEM block;
    out_ref: (1, BLOCK_ROWS, W)."""
    blk = pl.program_id(1)
    row0 = blk * BLOCK_ROWS

    # Mosaic's dynamic rotate is 32-bit only: compute in f32, with bf16 (if
    # any) kept at the HBM boundary.
    rows = in_ref[0].astype(jnp.float32)                 # (BR, Wp)

    # Per-row shifts for this block.
    f_list = []
    t_list = []
    for r in range(BLOCK_ROWS):
        sr = s_ref[0, 0, row0 + r]
        fr = jnp.floor(sr)
        f_list.append(fr.astype(jnp.int32))
        t_list.append(sr - fr)
    f = jnp.stack(f_list)                                # (BR,) int32
    t = jnp.stack(t_list)                                # (BR,) f32

    base = jnp.min(f)
    base = jnp.clip(base, -PAD, PAD - n_cand - 2)
    delta = jnp.clip(f - base, 0, n_cand - 1)            # (BR,)

    # Sample x + s -> padded index x + f + PAD; after rotating left by
    # (base + PAD), candidate d needs rolled[:, x + d] (+1 for the lerp tap).
    # pltpu.roll is a RIGHT-roll and a dynamic negative shift silently
    # miscompiles to zeros on this Mosaic stack, so express the left-roll as
    # its positive complement modulo the padded width.
    wp = rows.shape[-1]
    rolled = pltpu.roll(rows, (wp - (base + PAD)) % wp, 1)

    dtype = rolled.dtype
    t_col = t[:, None].astype(dtype)
    lerped = (1.0 - t_col) * rolled[:, : width + n_cand] \
        + t_col * rolled[:, 1: width + n_cand + 1]

    acc = jnp.zeros((BLOCK_ROWS, width), dtype)
    d_col = delta[:, None]
    for d in range(n_cand):
        sel = (d_col == d).astype(dtype)
        acc = acc + sel * lerped[:, d: d + width]
    out_ref[0] = acc.astype(out_ref.dtype)


def _shear_rows_pallas_impl(images: jnp.ndarray, s: jnp.ndarray,
                            n_cand: int, interpret: bool = False) -> jnp.ndarray:
    """images: (N, H, W) f32/bf16; s: (N, H) f32 -> (N, H, W) same dtype."""
    n, h, w = images.shape
    wp = w + 2 * PAD
    padded = jnp.pad(images, ((0, 0), (0, 0), (PAD, PAD)))
    kernel = functools.partial(_kernel, width=w, n_cand=n_cand)
    return pl.pallas_call(
        kernel,
        grid=(n, h // BLOCK_ROWS),
        in_specs=[
            pl.BlockSpec((1, 1, h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BLOCK_ROWS, wp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_ROWS, w), lambda i, j: (i, j, 0),
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
