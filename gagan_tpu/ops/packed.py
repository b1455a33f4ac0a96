"""Space-to-depth ("packed") convolution kernels for the high-resolution
synthesis tail.

StyleGAN2's highest-resolution convolutions have few channels (32 at 1024²),
wasting the 128x128 MXU: measured ~5.7 TF on v5e vs ~100 TF achievable.  This
module reformulates the tail EXACTLY (same math, fp-exact up to reassociation)
on a 2x2-packed grid: [N, C, H, W] -> [N, 4C, H/2, W/2] with channel index
(cell_row*2 + cell_col)*C + c.  The three tail ops become MXU-friendly
convs on the packed grid:

  * stride-1 3x3 conv            -> packed 3x3 conv, 4C_in -> 4C_out;
  * up=2 3x3 conv + FIR filter   -> one 3x3 conv from the UNPACKED low-res
    input straight to the packed high-res output (the zero-insert upsample,
    FIR low-pass, and transposed conv collapse into one composed kernel,
    mirroring the conv2d_resample up path, conv2d_resample.py:124-142);
  * FIR 2x upsample (skip-img)   -> grouped 3x3 conv to packed cells.

Kernels are built from the ordinary weights by static index arithmetic, so
the construction is differentiable and jit-friendly; the builders run inside
the training step at negligible cost (kernel-sized ops only).

1D derivation (each axis independent; 2D kernels are the tensor product):
with correlation taps w[0..2], flipped FIR taps Ff, and the reference padding
adjustments, the composed up-conv response is y[n] = sum_k G[2k - n + 3] x[k]
where G = conv(flip(w), flip(f)) * up; sampling parities gives per-cell 3-tap
kernels Gi[d] = G[2d + 3 - i].
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack(x: jax.Array) -> jax.Array:
    """[N, C, H, W] -> [N, 4C, H/2, W/2], cell-major channel order."""
    n, c, h, w = x.shape
    x = x.reshape(n, c, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 3, 5, 1, 2, 4)          # [N, 2, 2, C, H/2, W/2]
    return x.reshape(n, 4 * c, h // 2, w // 2)


def unpack(x: jax.Array) -> jax.Array:
    """Inverse of :func:`pack`."""
    n, c4, hh, ww = x.shape
    c = c4 // 4
    x = x.reshape(n, 2, 2, c, hh, ww)
    x = x.transpose(0, 3, 4, 1, 5, 2)          # [N, C, H/2, 2, W/2, 2]
    return x.reshape(n, c, hh * 2, ww * 2)


def pack_channel_tile(v: jax.Array) -> jax.Array:
    """Per-channel vector [.., C] -> packed [.., 4C] (cell-major)."""
    return jnp.concatenate([v, v, v, v], axis=-1)


def _cell_tap(i: int, p: int, a_range: int, offset: int) -> dict:
    """Valid (d -> a) taps for output cell i, input cell p:
    a = 2d + offset + p - i, a in [0, a_range)."""
    taps = {}
    for d in (-2, -1, 0, 1, 2):
        a = 2 * d + offset + p - i
        if 0 <= a < a_range:
            taps[d] = a
    return taps


def build_packed_conv3x3(w: jax.Array) -> jax.Array:
    """Stride-1 3x3 correlation on the packed grid.

    w: [O, I, 3, 3] -> Wp [4O, 4I, 3, 3]; conv(pack(x), Wp, pad 1) ==
    pack(conv(x, w, pad 1)).
    """
    out_ch, in_ch = w.shape[0], w.shape[1]
    wp = jnp.zeros((4 * out_ch, 4 * in_ch, 3, 3), dtype=w.dtype)
    # y[2h'+i] = sum_a w[a] x[2h'+i+a-1]; x index 2g'+p: a = 2e + 1 + p - i.
    for i in range(2):                 # out cell (per axis)
        for p in range(2):             # in cell
            taps = _cell_tap(i, p, 3, 1)
            for j in range(2):
                for q in range(2):
                    taps_x = _cell_tap(j, q, 3, 1)
                    for dy, ay in taps.items():
                        for dx, ax in taps_x.items():
                            wp = wp.at[
                                (i * 2 + j) * out_ch:(i * 2 + j + 1) * out_ch,
                                (p * 2 + q) * in_ch:(p * 2 + q + 1) * in_ch,
                                dy + 1, dx + 1,
                            ].set(w[:, :, ay, ax])
    return wp


def build_packed_upconv(w: jax.Array, f: jax.Array) -> jax.Array:
    """Composed (up=2 conv3x3 + separable FIR) kernel, unpacked -> packed.

    Matches conv2d_resample(x, w, f, up=2, padding=1, flip_weight=False):
    returns Wp [4O, I, 3, 3] such that
    conv(x, Wp, pad 1) == pack(conv2d_resample(x, w, f, up=2, padding=1,
    flip_weight=False)).
    """
    assert f.ndim == 1 and f.shape[0] == 4, "4-tap separable FIR expected"
    out_ch, in_ch = w.shape[0], w.shape[1]
    # Composed 1D kernel: y[n] = sum_c G[c] u[n + c - 3], u = zero-up(x),
    # G = corr-chain of flip(w) (flip_weight=False => convolution) and
    # flip(f) with the reference pad arithmetic; gain up=2 per axis.
    # G[c] = 2 * sum_{a+b=c} w_flip[a] f_flip[b],  w_flip = w reversed.
    #      = 2 * conv(reverse(w), reverse(f))[c]   (length 6)
    # y[2h'+i] = sum_d Gi[d] x[h'+d],  Gi[d] = G[2d + 3 - i], d in {-1,0,1}.
    f_flip = jnp.flip(f) * 2.0
    w_flip = jnp.flip(w, axis=(2, 3))
    # 2D composed kernel G2 = w_flip *conv* outer(f_flip, f_flip): [O,I,6,6].
    g = _kernel_conv2d(w_flip, jnp.outer(f_flip, f_flip))

    wp = jnp.zeros((4 * out_ch, in_ch, 3, 3), dtype=w.dtype)
    for i in range(2):
        for j in range(2):
            for d in (-1, 0, 1):
                for e in (-1, 0, 1):
                    cy = 2 * d + 3 - i
                    cx = 2 * e + 3 - j
                    if 0 <= cy < 6 and 0 <= cx < 6:
                        wp = wp.at[
                            (i * 2 + j) * out_ch:(i * 2 + j + 1) * out_ch,
                            :, d + 1, e + 1,
                        ].set(g[:, :, cy, cx])
    return wp


def build_packed_conv2x2(w: jax.Array) -> jax.Array:
    """Minimal-FLOP packed stride-1 3x3 correlation kernel (see
    :func:`conv_packed_3x3_cells`).

    w: [O, I, 3, 3] -> Wp [4O, 4I, 2, 2].  The dense [4O, 4I, 3, 3] form
    built by :func:`build_packed_conv3x3` is 75% structural zeros (4x the
    useful FLOPs on the MXU, which cannot skip them); restricting each
    output cell to its true 2x2 coarse support and re-aligning the cells by
    output slicing cuts that to 16/9.

    Derivation (per axis): y[2h'+i] = sum_a w[a] x[2h'+i+a-1]; with input
    cell p at coarse n', the coarse offset is e = (i+a-1-p)/2 in {-1, 0} for
    i=0 and {0, 1} for i=1.  A single pad-(1,1) size-2 window conv covers
    both: cell i reads its outputs at slice offset i, window tap t maps to
    e = t - 1 + i.

    Measured on v5e (bf16, 32ch packed @ 512): despite 2.25x fewer useful
    FLOPs this form is 0.67x the dense :func:`build_packed_conv3x3` path
    fwd (0.68x fwd+bwd) — the four shifted output slices + concat cost more
    HBM traffic than the structural zeros cost MXU time.  Kept as a
    correct, parity-tested alternative; the dense form stays the default.
    """
    out_ch, in_ch = w.shape[0], w.shape[1]
    # taps[i][(p, t)] = a
    ax = {0: {(0, 1): 1, (1, 0): 0, (1, 1): 2},
          1: {(0, 0): 0, (0, 1): 2, (1, 0): 1}}
    wp = jnp.zeros((4 * out_ch, 4 * in_ch, 2, 2), dtype=w.dtype)
    for i in range(2):
        for j in range(2):
            for (py, ty), ay in ax[i].items():
                for (px, tx), axx in ax[j].items():
                    wp = wp.at[
                        (i * 2 + j) * out_ch:(i * 2 + j + 1) * out_ch,
                        (py * 2 + px) * in_ch:(py * 2 + px + 1) * in_ch,
                        ty, tx,
                    ].set(w[:, :, ay, axx])
    return wp


def conv_packed_3x3_cells(xp: jax.Array, wp: jax.Array) -> jax.Array:
    """Apply a :func:`build_packed_conv2x2` kernel: pad-(1,1) 2x2 conv, then
    re-align each output cell by its (i, j) slice and re-concatenate.

    conv_packed_3x3_cells(pack(x), build_packed_conv2x2(w)) ==
    pack(conv2d(x, w, padding=1)), fp-exact up to reassociation (the same
    nine products per output element, summed in window order).
    """
    out_ch = wp.shape[0] // 4
    y = jax.lax.conv_general_dilated(
        xp, wp.astype(xp.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    h, w_ = y.shape[2] - 1, y.shape[3] - 1
    cells = [y[:, (i * 2 + j) * out_ch:(i * 2 + j + 1) * out_ch,
               i:h + i, j:w_ + j]
             for i in range(2) for j in range(2)]
    return jnp.concatenate(cells, axis=1)


def _kernel_conv2d(a: jax.Array, k2: jax.Array) -> jax.Array:
    """Full 2D convolution of per-(O,I) kernels a [O,I,ka,ka] with a small
    2D tap array k2 [kb,kb] -> [O,I,ka+kb-1,ka+kb-1]."""
    ka = a.shape[-1]
    kb = k2.shape[-1]
    out = jnp.zeros(a.shape[:2] + (ka + kb - 1, ka + kb - 1), dtype=a.dtype)
    for by in range(kb):
        for bx in range(kb):
            out = out.at[:, :, by:by + ka, bx:bx + ka].add(
                a * k2[by, bx].astype(a.dtype))
    return out


def build_packed_fir_upsample(f: jax.Array, channels: int) -> jax.Array:
    """FIR 2x upsample (upsample2d, gain=4) as a grouped conv to packed cells.

    Returns Wf [4C, 1, 3, 3] for feature_group_count=C:
    conv(img, Wf, pad 1, groups=C) == pack(upsample2d(img, f)).

    Derivation (per axis): upsample2d pads (2, 1) for a 4-tap filter, so
    y[n] = sum_b Ff[b] u[n + b - 2], u = zero-up(img), gain 2 per axis;
    y[2h'+i]: b = 2d + 2 - i -> per-cell taps Fi[d] = 2 * Ff[2d + 2 - i].
    """
    assert f.ndim == 1 and f.shape[0] == 4
    f_flip = jnp.flip(f) * 2.0
    cell_taps = {}
    for i in range(2):
        taps = jnp.zeros((3,), dtype=f.dtype)
        for d in (-1, 0, 1):
            b = 2 * d + 2 - i
            if 0 <= b < 4:
                taps = taps.at[d + 1].set(f_flip[b])
        cell_taps[i] = taps
    # Grouped conv requires c-major output ordering (outputs of group c are
    # contiguous): out index = c*4 + cell.  fir_upsample_packed reorders to
    # the cell-major packed layout afterwards.
    wf = jnp.zeros((4 * channels, 1, 3, 3), dtype=f.dtype)
    for i in range(2):
        for j in range(2):
            k2 = jnp.outer(cell_taps[i], cell_taps[j])
            for c in range(channels):
                wf = wf.at[c * 4 + (i * 2 + j), 0].set(k2)
    return wf


def fir_upsample_packed(img: jax.Array, f: jax.Array) -> jax.Array:
    """upsample2d(img, f) producing the packed layout directly."""
    channels = img.shape[1]
    wf = build_packed_fir_upsample(f, channels)
    y = conv_packed(img, wf, groups=channels)     # [N, C*4, H', W'] c-major
    n, _, hh, ww = y.shape
    y = y.reshape(n, channels, 4, hh, ww).transpose(0, 2, 1, 3, 4)
    return y.reshape(n, 4 * channels, hh, ww)


def build_torgb_transposed(w: jax.Array) -> jax.Array:
    """Packed-cell torgb 1x1 composed with depth-to-space, as one kernel.

    w: [img_ch, C] (the styled torgb weight) -> K [img_ch, 4C, 2, 2] such
    that conv_general_dilated(h, K, lhs_dilation=2, padding (1,1)x2) ==
    unpack(conv_packed(h, block_diag_cells(w))) — i.e. the [N,3,res,res]
    image DIRECTLY from the packed feature map, with no unpack relayout op
    anywhere (and none in the VJP either: the transpose of an lhs_dilated
    conv is a strided conv).  Measured against the packed-1x1+unpack
    boundary on v5e by tools/bench_relayout.py.

    Cell arithmetic: out[n, c, 2h'+i, 2w'+j] = sum_ci w[c,ci] *
    h[n, cell(i,j)*C+ci, h', w']; with lhs_dilation=2 and pad_lo=1 the
    kernel tap (1-i, 1-j) reads the dilated input at the (h', w') sample,
    so K[c, cell(i,j)*C+ci, 1-i, 1-j] = w[c, ci].
    """
    img_ch, c = w.shape
    k = jnp.zeros((img_ch, 4 * c, 2, 2), dtype=w.dtype)
    for i in range(2):
        for j in range(2):
            cell = i * 2 + j
            k = k.at[:, cell * c:(cell + 1) * c, 1 - i, 1 - j].set(w)
    return k


def conv_transposed_unpack(h: jax.Array, k: jax.Array) -> jax.Array:
    """Apply a :func:`build_torgb_transposed` kernel: packed [N,4C,H,W] ->
    unpacked [N, img_ch, 2H, 2W] in one lhs-dilated convolution."""
    return jax.lax.conv_general_dilated(
        h, k.astype(h.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def conv_packed(x: jax.Array, wp: jax.Array, groups: int = 1) -> jax.Array:
    pad = (wp.shape[-1] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, wp.astype(x.dtype), (1, 1), ((pad, pad), (pad, pad)),
        feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def build_packed_downconv(w: jax.Array, f: jax.Array) -> jax.Array:
    """Composed (FIR + stride-2 3x3 conv) kernel, packed -> unpacked.

    Matches conv2d_resample(x, w, f, down=2, padding=1, flip_weight=True):
    returns Wp [O, 4I, 3, 3] such that
    conv(pack(x), Wp, pad 1) == conv2d_resample(x, w, f, down=2, padding=1).

    1D: y[m] = sum_c G[c] x[2m + c - 2], G = conv(w, flip(f)) (support 6);
    packed input cell p at block offset d: c = 2d + p + 2.
    """
    assert f.ndim == 1 and f.shape[0] == 4
    out_ch, in_ch = w.shape[0], w.shape[1]
    f_flip = jnp.flip(f)
    # G2 = w *conv* outer(f_flip, f_flip): [O, I, 6, 6].  (w used unflipped:
    # flip_weight=True means correlation with w.)
    g = _kernel_conv2d(w, jnp.outer(f_flip, f_flip))
    wp = jnp.zeros((out_ch, 4 * in_ch, 3, 3), dtype=w.dtype)
    for p in range(2):
        for q in range(2):
            for d in (-1, 0, 1):
                for e in (-1, 0, 1):
                    cy = 2 * d + p + 2
                    cx = 2 * e + q + 2
                    if 0 <= cy < 6 and 0 <= cx < 6:
                        wp = wp.at[
                            :, (p * 2 + q) * in_ch:(p * 2 + q + 1) * in_ch,
                            d + 1, e + 1,
                        ].set(g[:, :, cy, cx])
    return wp


def build_packed_down1x1(w: jax.Array, f: jax.Array) -> jax.Array:
    """Composed (FIR + down-2) for a 1x1 conv (the resnet skip):
    conv2d_resample(x, w, f, down=2, padding=0) with kw=1.

    1D: y[m] = sum_b Ff[b] x[2m + b - 1]; packed: b = 2d + p + 1.
    Returns Wp [O, 4I, 3, 3].
    """
    assert f.ndim == 1 and f.shape[0] == 4
    out_ch, in_ch = w.shape[0], w.shape[1]
    f_flip = jnp.flip(f)
    g2 = jnp.outer(f_flip, f_flip)             # [4, 4] spatial
    wp = jnp.zeros((out_ch, 4 * in_ch, 3, 3), dtype=w.dtype)
    w11 = w[:, :, 0, 0]
    for p in range(2):
        for q in range(2):
            for d in (-1, 0, 1):
                for e in (-1, 0, 1):
                    by = 2 * d + p + 1
                    bx = 2 * e + q + 1
                    if 0 <= by < 4 and 0 <= bx < 4:
                        wp = wp.at[
                            :, (p * 2 + q) * in_ch:(p * 2 + q + 1) * in_ch,
                            d + 1, e + 1,
                        ].set(w11 * g2[by, bx])
    return wp


def build_packed_conv1x1(w: jax.Array) -> jax.Array:
    """Cell-diagonal packed kernel for a 1x1 conv (fromrgb/torgb)."""
    out_ch, in_ch = w.shape[0], w.shape[1]
    wp = jnp.zeros((4 * out_ch, 4 * in_ch, 1, 1), dtype=w.dtype)
    for cell in range(4):
        wp = wp.at[cell * out_ch:(cell + 1) * out_ch,
                   cell * in_ch:(cell + 1) * in_ch].set(w)
    return wp


def build_packed_upconv_packed(w: jax.Array, f: jax.Array) -> jax.Array:
    """Composed up-conv kernel whose INPUT is already packed.

    Matches conv2d_resample(x, w, f, up=2, padding=1, flip_weight=False)
    where x is the unpacked [N, I, H, W] input: with xp = pack(x)
    ([N, 4I, H/2, W/2]),

        repack_up(conv(xp, Wp, pad 1)) == pack(conv2d_resample(...))

    Wp: [16*O, 4*I, 3, 3].  Output channel layout (axis-major):
    [fine cell (i, j) within the packed output grid][coarse parity (r, s)
    on the input grid][O] — ``repack_up`` folds (r, s) into resolution.

    Derivation: build_packed_upconv gives y[2h+i] = sum_d Gi[d] x[h+d]
    (h on the input-resolution grid).  Writing h = 2g + r and
    x[h+d] = xp[(r+d) mod 2][g + (r+d - (r+d) mod 2) / 2] turns each d
    into one (input cell, coarse offset) tap; offsets stay in {-1, 0, 1}.
    """
    assert f.ndim == 1 and f.shape[0] == 4, "4-tap separable FIR expected"
    out_ch, in_ch = w.shape[0], w.shape[1]
    f_flip = jnp.flip(f) * 2.0
    w_flip = jnp.flip(w, axis=(2, 3))
    g = _kernel_conv2d(w_flip, jnp.outer(f_flip, f_flip))   # [O, I, 6, 6]

    wp = jnp.zeros((16 * out_ch, 4 * in_ch, 3, 3), dtype=w.dtype)
    for i in range(2):
        for j in range(2):
            for r in range(2):
                for s in range(2):
                    oc = ((i * 2 + j) * 4 + (r * 2 + s)) * out_ch
                    for dy in (-1, 0, 1):
                        cy = 2 * dy + 3 - i
                        if not 0 <= cy < 6:
                            continue
                        py = (r + dy) % 2
                        oy = (r + dy - py) // 2
                        for dx in (-1, 0, 1):
                            cx = 2 * dx + 3 - j
                            if not 0 <= cx < 6:
                                continue
                            px = (s + dx) % 2
                            ox = (s + dx - px) // 2
                            wp = wp.at[
                                oc:oc + out_ch,
                                (py * 2 + px) * in_ch:
                                (py * 2 + px + 1) * in_ch,
                                oy + 1, ox + 1,
                            ].set(g[:, :, cy, cx])
    return wp


def repack_up(y: jax.Array) -> jax.Array:
    """[N, 16C, G, G] (cell-major then parity-major, see
    build_packed_upconv_packed) -> [N, 4C, 2G, 2G] packed layout."""
    n, c16, gh, gw = y.shape
    c = c16 // 16
    y = y.reshape(n, 4, 2, 2, c, gh, gw)        # [N, cell, r, s, C, G, G]
    y = y.transpose(0, 1, 4, 5, 2, 6, 3)        # [N, cell, C, G, r, G, s]
    return y.reshape(n, 4 * c, 2 * gh, 2 * gw)
