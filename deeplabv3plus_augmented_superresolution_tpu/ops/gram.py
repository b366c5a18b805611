"""Precomputed Gram operator for the SR data-fidelity term.

The df term's gradient is 2 * lambda_df * (G x - b) with
G = sum_i A_i^T A_i and b = sum_i A_i^T y_i, where A_i = D . W_i is the
per-copy warp+downsample. G couples only HR pixels that share an LR sample
of some copy, so it is a *spatially-varying stencil* with small static
support (the composed interpolation windows), independent of image size and
copy count.

Extracting G once (via comb-image probes through the exact same operator the
solver uses) replaces the per-iteration 2 x num_aug warps with one
(2Ry+1)x(2Rx+1)-tap stencil apply: mathematically identical gradients, ~100x
less per-iteration work at full copy count, and the stencil is reusable
across solves over the same staged copies (threshold sweeps, lambda sweeps).

Extraction: for comb phase φ, the probe p_φ (ones at pixels ≡ φ mod S,
S = 2R+1) satisfies (G p_φ)[u] = G[u, v*] where v* is the unique comb point
within R of u (valid when S exceeds the support diameter); reorganizing over
phases yields c_δ[u] = G[u, u-δ]. Apply: (G x)[u] = Σ_δ c_δ[u] * x[u-δ] —
static shifts and FMAs only.

Aliased extraction (default, extract_gram_stencil_aliased): probing at x
period Rx+1 instead of 2Rx+1 puts TWO x offsets (δx and δx-(Rx+1)) in each
response, cutting the probe count (the extraction cost) almost in half.
G's symmetry G[u, u-δ] = G[u-δ, u] turns each aliased pair into an exact
stride-(Rx+1) linear recurrence along x, solved in closed form by a reverse
strided cumulative sum — see the derivation on the function. Identical
coefficients to the dense extraction (tests/test_gram.py), ~1.8x cheaper.
"""

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

RADIUS_Y = 3
RADIUS_X = 4


def _reorganize(responses: jnp.ndarray, h: int, w: int,
                radius_y: int, radius_x: int) -> jnp.ndarray:
    """(Sy*Sx, H, W) probe responses -> (Sy, Sx, H, W) coefficient maps."""
    sy, sx = 2 * radius_y + 1, 2 * radius_x + 1
    resp2 = responses.reshape(sy, sx, h, w)                  # [py, px, y, x]
    yy = jnp.arange(h)
    xx = jnp.arange(w)
    dy = jnp.arange(-radius_y, radius_y + 1)
    dx = jnp.arange(-radius_x, radius_x + 1)
    vy = (yy[None, :] - dy[:, None]) % sy                    # (Syo, H)
    vx = (xx[None, :] - dx[:, None]) % sx                    # (Sxo, W)
    # Separable gather-free selection over the small phase axes.
    mask_y = (vy[:, None, :] == jnp.arange(sy)[None, :, None]).astype(jnp.float32)
    a1 = jnp.einsum("ipy,pqyx->iqyx", mask_y, resp2)
    mask_x = (vx[:, None, :] == jnp.arange(sx)[None, :, None]).astype(jnp.float32)
    return jnp.einsum("jqx,iqyx->ijyx", mask_x, a1)          # (Sy, Sx, H, W)


def extract_gram_stencil(normal_op: Callable[[jnp.ndarray], jnp.ndarray],
                         output_size: Tuple[int, int],
                         radius_y: int = RADIUS_Y,
                         radius_x: int = RADIUS_X) -> jnp.ndarray:
    """Coefficient maps c (Sy, Sx, H, W) with c[dy+Ry, dx+Rx][u] = G[u, u-δ].

    normal_op: x (1, H, W, 1) -> (G x) (1, H, W, 1), e.g. A^T A via jax.vjp.
    The radii must bound G's support; tests verify this empirically for the
    workload's operators.
    """
    h, w = output_size
    sy, sx = 2 * radius_y + 1, 2 * radius_x + 1
    yy = jnp.arange(h)
    xx = jnp.arange(w)

    def probe(phase):
        py, px = phase // sx, phase % sx
        comb = ((yy[:, None] % sy) == py) & ((xx[None, :] % sx) == px)
        p = comb.astype(jnp.float32)[None, :, :, None]
        return normal_op(p)[0, :, :, 0]

    responses = jax.lax.map(probe, jnp.arange(sy * sx))      # (Sy*Sx, H, W)
    return _reorganize(responses, h, w, radius_y, radius_x)


def _shift2d(m: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[y, x] = m[y + dy, x + dx], zero fill (static dy/dx)."""
    h, w = m.shape
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    padded = jnp.pad(m, ((py1, py0), (px1, px0)))
    return jax.lax.dynamic_slice(padded, (py1 + dy, px1 + dx), (h, w))


def _reverse_strided_cumsum(t: jnp.ndarray, stride: int) -> jnp.ndarray:
    """c[y, x] = sum_{k>=0} t[y, x + stride*k] (the closed form of the
    recurrence c[x] = t[x] + c[x + stride])."""
    h, w = t.shape
    wp = -(-w // stride) * stride
    t5 = jnp.pad(t, ((0, 0), (0, wp - w))).reshape(h, wp // stride, stride)
    c5 = jnp.flip(jnp.cumsum(jnp.flip(t5, axis=1), axis=1), axis=1)
    return c5.reshape(h, wp)[:, :w]


def extract_gram_stencil_aliased(
        normal_op: Callable[[jnp.ndarray], jnp.ndarray],
        output_size: Tuple[int, int],
        radius_y: int = RADIUS_Y,
        radius_x: int = RADIUS_X) -> jnp.ndarray:
    """Same coefficients as extract_gram_stencil from (2Ry+1)*(Rx+1) probes
    instead of (2Ry+1)*(2Rx+1) — 35 vs 63 at the default radii.

    Probing at x period P = Rx+1 aliases offsets δx and δx-P (both within
    ±Rx for δx in [1, Rx]) into one response:

        S[dy, a][u] = c_(dy, a)[u] + c_(dy, a-P)[u],   a in [1, Rx]
        S[dy, 0][u] = c_(dy, 0)[u]

    G's symmetry (c_δ[u] = G[u, u-δ] = G[u-δ, u] = c_{-δ}[u-δ]) rewrites the
    second term: c_(dy, a-P)[u] = c_(-dy, P-a)[u_y-dy, u_x+P-a]. Substituting
    it into ITS aliased sum S[-dy, P-a] closes a two-step cycle that
    telescopes into a single-map recurrence along x:

        c_(dy, a)[y, x] = T[y, x] + c_(dy, a)[y, x + P],
        T[y, x] = S[dy, a][y, x] - S[-dy, P-a][y - dy, x + P - a],

    whose exact solution is the reverse stride-P cumulative sum of T (the
    chain terminates at the right edge, where the zero-extended G vanishes).
    The negative offsets follow from the sums: c_(dy, a-P) = S[dy, a] -
    c_(dy, a).
    """
    h, w = output_size
    sy = 2 * radius_y + 1
    px = radius_x + 1
    yy = jnp.arange(h)
    xx = jnp.arange(w)

    def probe(phase):
        py, pxi = phase // px, phase % px
        comb = ((yy[:, None] % sy) == py) & ((xx[None, :] % px) == pxi)
        p = comb.astype(jnp.float32)[None, :, :, None]
        return normal_op(p)[0, :, :, 0]

    responses = jax.lax.map(probe, jnp.arange(sy * px))     # (Sy*Px, H, W)

    # Reorganize responses into S[dy + Ry, a][u]: the response of the probe
    # whose comb phase is (u_y - dy mod Sy, u_x - a mod Px).
    resp2 = responses.reshape(sy, px, h, w)
    dy_off = jnp.arange(-radius_y, radius_y + 1)
    vy = (yy[None, :] - dy_off[:, None]) % sy               # (Sy, H)
    mask_y = (vy[:, None, :] == jnp.arange(sy)[None, :, None]).astype(jnp.float32)
    a_off = jnp.arange(px)
    vx = (xx[None, :] - a_off[:, None]) % px                # (Px, W)
    mask_x = (vx[:, None, :] == jnp.arange(px)[None, :, None]).astype(jnp.float32)
    s_maps = jnp.einsum("ipy,pqyx->iqyx", mask_y, resp2)
    s_maps = jnp.einsum("jqx,iqyx->ijyx", mask_x, s_maps)   # (Sy, Px, H, W)

    sx = 2 * radius_x + 1
    coeffs = [[None] * sx for _ in range(sy)]
    for iy in range(sy):
        dy = iy - radius_y
        coeffs[iy][radius_x] = s_maps[iy, 0]                # δx = 0, direct
        for a in range(1, px):
            t = s_maps[iy, a] - _shift2d(s_maps[sy - 1 - iy, px - a],
                                         -dy, px - a)
            c_pos = _reverse_strided_cumsum(t, px)          # δx = a
            coeffs[iy][radius_x + a] = c_pos
            coeffs[iy][radius_x + a - px] = s_maps[iy, a] - c_pos
    return jnp.stack([jnp.stack(row) for row in coeffs])    # (Sy, Sx, H, W)


@partial(jax.jit, static_argnames=("radius_y", "radius_x"))
def apply_gram(x: jnp.ndarray, coeffs: jnp.ndarray,
               radius_y: int = RADIUS_Y, radius_x: int = RADIUS_X) -> jnp.ndarray:
    """(G x) for x (1, H, W, 1) via static-shift FMAs."""
    h, w = x.shape[1], x.shape[2]
    img = x[0, :, :, 0]
    padded = jnp.pad(img, ((radius_y, radius_y), (radius_x, radius_x)))
    out = jnp.zeros((h, w), jnp.float32)
    sy, sx = 2 * radius_y + 1, 2 * radius_x + 1
    for iy in range(sy):
        for ix in range(sx):
            # x[u - δ] with δ = (iy - Ry, ix - Rx): shifted window starts at
            # (Ry - δy, Rx - δx) = (2Ry - iy, 2Rx - ix) in padded coords.
            win = jax.lax.dynamic_slice(
                padded, (2 * radius_y - iy, 2 * radius_x - ix), (h, w))
            out = out + coeffs[iy, ix] * win
    return out[None, :, :, None]
