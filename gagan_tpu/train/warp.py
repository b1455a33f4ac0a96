"""Gather-free affine image warping for the ADA pipe on TPU.

XLA lowers per-pixel gathers (torch grid_sample style) onto the TPU scalar
core: the bilinear sampler costs ~650 ms per 32x3x524x524 batch — 20x the
rest of the augmentation pipe combined.  This module re-expresses the affine
warp with dense, vectorizable primitives only:

  separable 2-pass decomposition (Catmull-Smith):
    out[h, w'] = x[v(h, u), u],  u = s*w' + t*h + m,  v = p*h + q*w + r
  each 1D pass =  per-row integer+fractional shift  (two-hot depthwise conv,
                  kernel built from iota comparisons — no gather)
               @  per-sample scale resampling        (banded triangle matmul
                  on the MXU).

The composed interpolation kernel is triangle (*) lerp per pass — a slightly
softer antialiasing kernel than pure bilinear (exactly bilinear when the
pass scale is 1, e.g. pure shears/translations).  The decomposition is
singular near 90-degree rotations, so a transposed variant is computed and
selected per sample.  The eager path of the augment pipe keeps the exact
gather-based sampler for bit-parity tests; this fast path runs under jit.

Why not a Pallas kernel: a hand-written per-row shift kernel (128-aligned
dynamic lane slice + pltpu.roll for the residual, per v5e Mosaic's
alignment rules) measures within 5% of the one-hot-conv formulation at the
1024-pipe shapes (36.6 vs 38.4 ms) — arbitrary per-row lane shifts cost
lane rotations either way, and the conv form gets them through the MXU
with no custom kernel to maintain.

Cost note (round-3 A/B "exact@p0.3 outlier" resolved): the exact gather
path does NOT have a runtime cliff.  The 8.8x wall-time outlier in
docs/ab_dynamics_p.json (exact@p0.3 2056 s vs exact@p0.6 233 s, identical
programs — p is runtime data, not a compile-time constant) was the FIRST
exact arm paying the full train-step compile inside the timed loop while
the second hit the persistent executable cache.  tools/ab_train.py now
AOT-compiles every step variant before timing and reports compile_s
separately; the re-measured exact arm (docs/ga_dynamics.json) runs at
fast-arm-comparable wall time per step plus the documented ~650 ms/batch
gather overhead.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _one_hot_block_shift(x: jax.Array, k: jax.Array, block: int,
                         keep: int) -> jax.Array:
    """Shift rows by k[n,h]*block pixels: one-hot matmul over blocks.

    x: [N,C,H,W] with W % block == 0; returns [N,C,H,keep*block] containing
    x[.., k*block : k*block + keep*block].

    Expressed as a per-(n,h) [J, keep] one-hot matrix contracted over the
    block index by einsum — measured ~2x faster on TPU than the equivalent
    grouped conv with n*c*h feature groups (which Mosaic tiles one
    single-channel group at a time)."""
    n, c, h, w_in = x.shape
    wc = w_in // block
    k_i = jnp.clip(k, 0.0, float(wc - keep))
    src = jax.lax.broadcasted_iota(jnp.float32, (n, h, wc, keep), 2)
    dst = jax.lax.broadcasted_iota(jnp.float32, (n, h, wc, keep), 3)
    m = (src == k_i[:, :, None, None] + dst).astype(x.dtype)
    xb = x.reshape(n, c, h, wc, block)
    y = jnp.einsum("nchJb,nhJj->nchjb", xb, m)
    return y.reshape(n, c, h, keep * block)


def _two_hot_shift(x: jax.Array, shift: jax.Array, out_w: int,
                   blocks=(256, 16)) -> jax.Array:
    """Per-row fractional shift, multi-level hierarchical (no gather).

    x: [N, C, H, W]; shift: [N, H] (input-pixel offset of output column 0).
    Returns y [N, C, H, out_w] = lerp(x[h, k+w], x[h, k+w+1], frac(shift)).

    The integer shift splits into block shifts at decreasing granularities
    (one-hot block matmuls over W/b positions each) plus a final fractional
    two-hot stage over adjacent block pairs, keeping every contraction
    length O(W/b0 + b0/b1 + ... + 2*b_last)."""
    n, c, h, w_in = x.shape
    blocks = [b for b in blocks if b > 1 and b * 4 <= w_in]
    if not blocks:
        blocks = [max(2, 1 << max(0, (w_in // 4).bit_length() - 1))]
    b0 = blocks[0]
    pad = (-w_in) % b0
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad)))
        w_in += pad

    shift = jnp.clip(shift, 0.0, w_in - out_w - 2.0)
    residual = shift
    cur = x
    for b in blocks:
        k = jnp.floor(residual / b)
        residual = residual - k * b                 # in [0, b)
        # Window to keep: enough for out_w + the remaining shift budget.
        need = out_w + b + 2
        keep = min(-(-need // b) + 1, cur.shape[-1] // b)
        cur = _one_hot_block_shift(cur, k, b, keep)

    # Fine: fractional two-hot over adjacent pairs of last-level blocks.
    # residual < bf here, so output block j draws only from input blocks
    # j and j+1: contract [2*bf -> bf] with a per-(n,h) two-hot matrix.
    bf = blocks[-1]
    k_f = jnp.floor(residual)
    f = (residual - k_f).astype(x.dtype)
    # The pair-block stage yields (width/bf - 1) * bf columns; pad so that
    # covers out_w (keep may have been clamped to the whole array above).
    min_width = (-(-out_w // bf) + 1) * bf
    if cur.shape[-1] < min_width:
        cur = jnp.pad(cur, ((0, 0), (0, 0), (0, 0),
                            (0, min_width - cur.shape[-1])))
    j2 = cur.shape[-1] // bf
    xb = cur.reshape(n, c, h, j2, bf)
    xcat = jnp.concatenate([xb[:, :, :, :-1, :], xb[:, :, :, 1:, :]],
                           axis=-1)                 # [N,C,H,j2-1,2*bf]
    t_idx = jax.lax.broadcasted_iota(jnp.float32, (n, h, 2 * bf, bf), 2)
    b_idx = jax.lax.broadcasted_iota(jnp.float32, (n, h, 2 * bf, bf), 3)
    rel = t_idx - b_idx
    kf = k_f[:, :, None, None]
    kernel_f = ((rel == kf).astype(x.dtype) * (1.0 - f[:, :, None, None])
                + (rel == kf + 1.0).astype(x.dtype) * f[:, :, None, None])
    y = jnp.einsum("nchjt,nhtb->nchjb", xcat, kernel_f)
    return y.reshape(n, c, h, (j2 - 1) * bf)[..., :out_w]


def _scale_matmul(x: jax.Array, scale: jax.Array, offset: jax.Array,
                  out_w: int, antialias: bool = False) -> jax.Array:
    """Per-sample triangle-kernel resampling y[w'] = sum_w x[w] tri(s*w'+o-w).

    x: [N, C, H, W]; scale, offset: [N].  Dense banded matmul on the MXU.

    With ``antialias`` the triangle half-width grows to max(1, |scale|)
    (area-weighted minification filter, torch antialias=True style) and the
    rows are renormalized to a partition of unity — this subsumes the
    reference's upsample-2x / FIR-downsample antialiasing pyramid
    (augment.py:352-370) at native resolution."""
    n, c, h, w_in = x.shape
    wp = jax.lax.broadcasted_iota(jnp.float32, (n, w_in, out_w), 2)
    wi = jax.lax.broadcasted_iota(jnp.float32, (n, w_in, out_w), 1)
    u = scale[:, None, None] * wp + offset[:, None, None]
    if antialias:
        width = jnp.maximum(1.0, jnp.abs(scale))[:, None, None]
        b = jnp.maximum(0.0, 1.0 - jnp.abs(u - wi) / width)
        b = b / jnp.maximum(jnp.sum(b, axis=1, keepdims=True), 1e-8)
        b = b.astype(x.dtype)
    else:
        b = jnp.maximum(0.0, 1.0 - jnp.abs(u - wi)).astype(x.dtype)
    return jnp.einsum("nchw,nwv->nchv", x, b)


def _pixel_affine_from_theta(theta: jax.Array, in_h: int, in_w: int,
                             out_h: int, out_w: int):
    """theta [N, 2, 3] (normalized coords, torch affine_grid convention) ->
    pixel-space coefficients: ix = axx*ow + axy*oh + ax0 (same for iy)."""
    # gx = (2 ow + 1)/out_w - 1;  ix = (sx + 1) * in_w / 2 - 0.5.
    def coefs(row, in_dim):
        a, b, cst = theta[:, row, 0], theta[:, row, 1], theta[:, row, 2]
        cx = a * (2.0 / out_w) * (in_dim / 2.0)
        cy = b * (2.0 / out_h) * (in_dim / 2.0)
        c0 = ((a * (1.0 / out_w - 1.0) + b * (1.0 / out_h - 1.0) + cst + 1.0)
              * (in_dim / 2.0) - 0.5)
        return cx, cy, c0

    axx, axy, ax0 = coefs(0, in_w)
    ayx, ayy, ay0 = coefs(1, in_h)
    return (axx, axy, ax0), (ayx, ayy, ay0)


def _warp_yx(x: jax.Array, coef_x, coef_y, out_h: int, out_w: int,
             eps: float = 1e-3, antialias: bool = False) -> jax.Array:
    """2-pass warp: vertical resample then horizontal.

    ix = s*w' + t*h' + m;  iy = (p)*h' + q*ix + r with q = ayx/axx.
    Singular as axx -> 0 (caller provides the transposed variant).
    """
    n, c, in_h, in_w = x.shape
    (axx, axy, ax0) = coef_x
    (ayx, ayy, ay0) = coef_y
    sign = jnp.where(axx >= 0, 1.0, -1.0)
    axx_safe = jnp.where(jnp.abs(axx) < eps, sign * eps, axx)
    q = ayx / axx_safe
    p = ayy - q * axy
    r = ay0 - q * ax0

    def shift_scale_pass(data, shifts, scale, out_dim):
        """data [N,C,R,D]; sample positions scale*j + shifts[n,row], j in
        [0, out_dim); returns [N,C,R,out_dim].

        Sizing: shifts are covered for |shifts + base| <= D (clamped beyond —
        extreme-tail draws only); the scale window covers |scale| <= ~2.
        """
        d = data.shape[-1]
        slack = 3 if antialias else 1     # AA kernel reaches +-|scale| taps
        window = 2 * out_dim + 4 + 2 * slack  # span: covers |scale|<=2
        max_shift = d                     # static shift coverage
        pad_low = max_shift + 1           # window origin k >= 0
        pad_high = pad_low + window + 4
        data = jnp.pad(data, ((0, 0), (0, 0), (0, 0), (pad_low, pad_high)))
        # base absorbs negative scales so in-window positions start >= slack.
        base = jnp.minimum(0.0, scale * (out_dim - 1)) - slack
        shifted = _two_hot_shift(data, shifts + base[:, None] + pad_low,
                                 window)
        return _scale_matmul(shifted, scale, -base, out_dim,
                             antialias=antialias)

    # ---- Pass 1 (vertical): I1[h', w] = x[p*h' + q*w + r, w] ----
    xt = jnp.swapaxes(x, 2, 3)                     # [N, C, W, H]
    w_idx = jnp.arange(in_w, dtype=jnp.float32)
    shift_v = q[:, None] * w_idx[None, :] + r[:, None]     # [N, W]
    i1 = shift_scale_pass(xt, shift_v, p, out_h)
    i1 = jnp.swapaxes(i1, 2, 3)                    # [N, C, out_h, W]

    # ---- Pass 2 (horizontal): out[h', w'] = I1[h', s*w' + t*h' + m] ----
    h_idx = jnp.arange(out_h, dtype=jnp.float32)
    shift_u = axy[:, None] * h_idx[None, :] + ax0[:, None]  # [N, out_h]
    return shift_scale_pass(i1, shift_u, axx, out_w)


def affine_warp(images: jax.Array, theta: jax.Array, out_h: int,
                out_w: int, antialias: bool = False) -> jax.Array:
    """Gather-free replacement for affine_grid_sample (same signature).

    Computes the normal and transposed 2-pass variants and selects per
    sample by which diagonal dominates (rotation quadrant).  With
    ``antialias`` each 1D pass uses a scale-aware triangle kernel, making
    the oversample/FIR pyramid of the reference pipeline unnecessary.
    """
    n, c, in_h, in_w = images.shape
    coef_x, coef_y = _pixel_affine_from_theta(theta, in_h, in_w, out_h, out_w)
    (axx, axy, ax0) = coef_x
    (ayx, ayy, ay0) = coef_y
    use_a = jnp.abs(axx * ayy) >= jnp.abs(axy * ayx)

    if in_h == in_w:
        # Square input (the augment-pipe case): the transposed variant is
        # the same warp applied to x^T with the coefficient roles swapped,
        # so a per-sample select of (input orientation, coefficients) runs
        # ONE warp instead of two — identical outputs at half the cost.
        x_sel = jnp.where(use_a[:, None, None, None], images,
                          jnp.swapaxes(images, 2, 3))

        def sel(a, b):
            return jnp.where(use_a, a, b)

        coef1 = (sel(axx, ayx), sel(axy, ayy), sel(ax0, ay0))
        coef2 = (sel(ayx, axx), sel(ayy, axy), sel(ay0, ax0))
        return _warp_yx(x_sel, coef1, coef2, out_h, out_w,
                        antialias=antialias)

    # Rectangular input: compute both variants and select.
    out_a = _warp_yx(images, coef_x, coef_y, out_h, out_w,
                     antialias=antialias)
    images_t = jnp.swapaxes(images, 2, 3)
    out_b = _warp_yx(images_t, coef_y, coef_x, out_h, out_w,
                     antialias=antialias)
    return jnp.where(use_a[:, None, None, None], out_a, out_b)
