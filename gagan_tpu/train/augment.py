"""ADA augmentation pipeline as a pure-XLA program.

Re-expression of the reference `AugmentPipe`
(`DissimilarDomains/training/augment.py:184-520`, from "Training Generative
Adversarial Networks with Limited Data"): pixel blitting + general geometric
transforms composed as inverse homogeneous 3x3 matrices executed with
orthogonal-wavelet up/downsampling around one bilinear resample; color
transforms as homogeneous 4x4 matrices; wavelet-bank image-space filtering;
additive noise; cutout.  All probability gating is `jnp.where` masks on
per-sample draws, so the whole pipe jits into the training step (the
reference's data-dependent `if` guards become static config checks).

`debug_percentile` replaces every random draw with the given quantile exactly
like the reference (augment.py:253-511) — it is the bit-parity oracle hook
used by tests/test_augment_parity.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gagan_tpu.ops.upfirdn2d import setup_filter, upsample2d, downsample2d

# Wavelet low-pass coefficients (augment.py:21-85).
WAVELETS = {
    "haar": [0.7071067811865476, 0.7071067811865476],
    "sym2": [-0.12940952255092145, 0.22414386804185735, 0.836516303737469,
             0.48296291314469025],
    "sym6": [0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
             -0.048311742585633, 0.4910559419267466, 0.787641141030194,
             0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
             0.04472490177066578, 0.0017677118642428036, -0.007800708325034148],
}


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    # Pixel blitting.
    xflip: float = 0.0
    rotate90: float = 0.0
    xint: float = 0.0
    xint_max: float = 0.125
    # General geometric.
    scale: float = 0.0
    rotate: float = 0.0
    aniso: float = 0.0
    xfrac: float = 0.0
    scale_std: float = 0.2
    rotate_max: float = 1.0
    aniso_std: float = 0.2
    xfrac_std: float = 0.125
    # Color.
    brightness: float = 0.0
    contrast: float = 0.0
    lumaflip: float = 0.0
    hue: float = 0.0
    saturation: float = 0.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    # Image-space filtering.
    imgfilter: float = 0.0
    imgfilter_bands: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    imgfilter_std: float = 1.0
    # Corruptions.
    noise: float = 0.0
    cutout: float = 0.0
    noise_std: float = 0.1
    cutout_size: float = 0.5
    # Static reflect-pad margin under jit: width // jit_margin_divisor
    # (+ filter support).  See the geometric-execution note below.
    jit_margin_divisor: int = 4
    # Optional reduced-precision image dtype for the pipe ("bfloat16").
    # The augmented images feed a discriminator whose high-res blocks run
    # bf16 anyway (num_fp16_res), so quantizing here loses nothing the D
    # would have seen — and the warp/color work is HBM-bandwidth-bound, so
    # halving the bytes roughly halves its cost.  None (default) keeps the
    # input dtype; parity tests rely on the default.
    compute_dtype: Optional[str] = None
    # Geometric-warp execution:  "auto" = exact 2x-FIR-pyramid grid-sample
    # eagerly, gather-free native-resolution warp under jit; "fast" = the
    # gather-free warp always; "exact" = the reference pyramid always,
    # including under jit (a full-width static reflect margin replaces the
    # data-dependent one — bit-exact within it, but the gather runs on the
    # TPU scalar core: ~10x slower; for parity runs that must match
    # augment.py:338-370 under jit).
    geom_mode: str = "auto"


# Preset table mirroring train.py augpipe_specs (train.py:357-370).
AUGPIPE_SPECS = {
    "blit": dict(xflip=1, rotate90=1, xint=1),
    "geom": dict(scale=1, rotate=1, aniso=1, xfrac=1),
    "color": dict(brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1),
    "filter": dict(imgfilter=1),
    "noise": dict(noise=1),
    "cutout": dict(cutout=1),
    "bg": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1),
    "bgc": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                saturation=1),
    "bgcf": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                 xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                 saturation=1, imgfilter=1),
    "bgcfn": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                  xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                  saturation=1, imgfilter=1, noise=1),
    "bgcfnc": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                   xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                   saturation=1, imgfilter=1, noise=1, cutout=1),
}


def make_config(spec: str, compute_dtype: Optional[str] = None) -> AugmentConfig:
    return AugmentConfig(**AUGPIPE_SPECS[spec], compute_dtype=compute_dtype)


# ----------------------------------------------------------------------------
# Homogeneous matrix helpers (augment.py:91-173); batched over leading dims.


def _rows(*rows):
    return jnp.stack([jnp.stack(
        [r if isinstance(r, jnp.ndarray) else jnp.asarray(float(r)) for r in row],
        axis=-1) for row in rows], axis=-2)


def _bmat(batch_shape, *rows):
    """Build a batch of matrices, broadcasting python scalars over batch."""
    out_rows = []
    for row in rows:
        elems = []
        for x in row:
            x = jnp.asarray(x, dtype=jnp.float32)
            elems.append(jnp.broadcast_to(x, batch_shape))
        out_rows.append(jnp.stack(elems, axis=-1))
    return jnp.stack(out_rows, axis=-2)


def translate2d(tx, ty, batch_shape=()):
    return _bmat(batch_shape, [1, 0, tx], [0, 1, ty], [0, 0, 1])


def scale2d(sx, sy, batch_shape=()):
    return _bmat(batch_shape, [sx, 0, 0], [0, sy, 0], [0, 0, 1])


def rotate2d(theta, batch_shape=()):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return _bmat(batch_shape, [c, -s, 0], [s, c, 0], [0, 0, 1])


def translate3d(tx, ty, tz, batch_shape=()):
    return _bmat(batch_shape, [1, 0, 0, tx], [0, 1, 0, ty], [0, 0, 1, tz],
                 [0, 0, 0, 1])


def scale3d(sx, sy, sz, batch_shape=()):
    return _bmat(batch_shape, [sx, 0, 0, 0], [0, sy, 0, 0], [0, 0, sz, 0],
                 [0, 0, 0, 1])


def rotate3d(v, theta, batch_shape=()):
    vx, vy, vz = v[0], v[1], v[2]
    s, c = jnp.sin(theta), jnp.cos(theta)
    cc = 1 - c
    return _bmat(
        batch_shape,
        [vx * vx * cc + c, vx * vy * cc - vz * s, vx * vz * cc + vy * s, 0],
        [vy * vx * cc + vz * s, vy * vy * cc + c, vy * vz * cc - vx * s, 0],
        [vz * vx * cc - vy * s, vz * vy * cc + vx * s, vz * vz * cc + c, 0],
        [0, 0, 0, 1])


def translate2d_inv(tx, ty, batch_shape=()):
    return translate2d(-tx, -ty, batch_shape)


def scale2d_inv(sx, sy, batch_shape=()):
    return scale2d(1 / sx, 1 / sy, batch_shape)


def rotate2d_inv(theta, batch_shape=()):
    return rotate2d(-theta, batch_shape)


# ----------------------------------------------------------------------------
# Bilinear resample matching torch affine_grid(align_corners=False) +
# grid_sample(bilinear, zeros padding) (augment.py:366-367).


def affine_grid_sample(images: jax.Array, theta: jax.Array,
                       out_h: int, out_w: int) -> jax.Array:
    n, c, in_h, in_w = images.shape
    ys = (2.0 * jnp.arange(out_h) + 1.0) / out_h - 1.0
    xs = (2.0 * jnp.arange(out_w) + 1.0) / out_w - 1.0
    gx = xs[None, None, :]  # [1, 1, W]
    gy = ys[None, :, None]  # [1, H, 1]
    # grid = theta @ [x, y, 1]
    sx = theta[:, 0, 0][:, None, None] * gx + theta[:, 0, 1][:, None, None] * gy \
        + theta[:, 0, 2][:, None, None]
    sy = theta[:, 1, 0][:, None, None] * gx + theta[:, 1, 1][:, None, None] * gy \
        + theta[:, 1, 2][:, None, None]
    # Normalized -> input pixel coordinates (align_corners=False).
    ix = (sx + 1.0) * (in_w / 2.0) - 0.5
    iy = (sy + 1.0) * (in_h / 2.0) - 0.5

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0

    def gather(yy, xx):
        valid = ((xx >= 0) & (xx < in_w) & (yy >= 0) & (yy < in_h))
        xc = jnp.clip(xx, 0, in_w - 1).astype(jnp.int32)
        yc = jnp.clip(yy, 0, in_h - 1).astype(jnp.int32)
        flat = images.reshape(n, c, in_h * in_w)
        idx = (yc * in_w + xc).reshape(n, -1)                     # [N, H*W]
        vals = jnp.take_along_axis(flat, idx[:, None, :], axis=2)
        vals = vals.reshape(n, c, out_h, out_w)
        return vals * valid[:, None, :, :].astype(images.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[:, None].astype(images.dtype)
    wy = wy[:, None].astype(images.dtype)
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


# ----------------------------------------------------------------------------


def _filter_bank() -> np.ndarray:
    """4-band wavelet filter bank (augment.py:238-247)."""
    import scipy.signal

    Hz_lo = np.asarray(WAVELETS["sym2"])
    Hz_hi = Hz_lo * ((-1) ** np.arange(Hz_lo.size))
    Hz_lo2 = np.convolve(Hz_lo, Hz_lo[::-1]) / 2
    Hz_hi2 = np.convolve(Hz_hi, Hz_hi[::-1]) / 2
    Hz_fbank = np.eye(4, 1)
    for i in range(1, Hz_fbank.shape[0]):
        Hz_fbank = np.dstack([Hz_fbank, np.zeros_like(Hz_fbank)]).reshape(
            Hz_fbank.shape[0], -1)[:, :-1]
        Hz_fbank = scipy.signal.convolve(Hz_fbank, [Hz_lo2])
        Hz_fbank[i, (Hz_fbank.shape[1] - Hz_hi2.size) // 2:
                 (Hz_fbank.shape[1] + Hz_hi2.size) // 2] += Hz_hi2
    return Hz_fbank


_HZ_FBANK = _filter_bank()
_HZ_GEOM_TAPS = WAVELETS["sym6"]


def _erfinv(x):
    return jax.lax.erf_inv(x)


def augment_pipe(
    cfg: AugmentConfig,
    images: jax.Array,        # [N, C, H, W], float
    p,                        # overall probability multiplier (scalar)
    key: jax.Array,
    debug_percentile: Optional[float] = None,
) -> jax.Array:
    """Apply the ADA pipe.  Pure function; gradients flow through images."""
    batch, channels, height, width = images.shape
    in_dtype = images.dtype
    if cfg.compute_dtype is not None:
        images = images.astype(jnp.dtype(cfg.compute_dtype))
    p = jnp.asarray(p, dtype=jnp.float32)
    dp = (None if debug_percentile is None
          else jnp.asarray(debug_percentile, jnp.float32))
    keys = iter(jax.random.split(key, 32))

    def rand(shape=()):
        return jax.random.uniform(next(keys), shape)

    def randn(shape=()):
        return jax.random.normal(next(keys), shape)

    # ----- Pixel blitting + geometric: accumulate inverse 3x3 -----
    G_inv = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (batch, 1, 1))
    geometric = False

    if cfg.xflip > 0:
        geometric = True
        i = jnp.floor(rand([batch]) * 2)
        i = jnp.where(rand([batch]) < cfg.xflip * p, i, 0.0)
        if dp is not None:
            i = jnp.full([batch], jnp.floor(dp * 2))
        G_inv = G_inv @ scale2d_inv(1 - 2 * i, jnp.ones([batch]), (batch,))

    if cfg.rotate90 > 0:
        geometric = True
        i = jnp.floor(rand([batch]) * 4)
        i = jnp.where(rand([batch]) < cfg.rotate90 * p, i, 0.0)
        if dp is not None:
            i = jnp.full([batch], jnp.floor(dp * 4))
        G_inv = G_inv @ rotate2d_inv(-np.pi / 2 * i, (batch,))

    if cfg.xint > 0:
        geometric = True
        t = (rand([batch, 2]) * 2 - 1) * cfg.xint_max
        t = jnp.where(rand([batch, 1]) < cfg.xint * p, t, 0.0)
        if dp is not None:
            t = jnp.full([batch, 2], (dp * 2 - 1) * cfg.xint_max)
        G_inv = G_inv @ translate2d_inv(jnp.round(t[:, 0] * width),
                                        jnp.round(t[:, 1] * height), (batch,))

    if cfg.scale > 0:
        geometric = True
        s = jnp.exp2(randn([batch]) * cfg.scale_std)
        s = jnp.where(rand([batch]) < cfg.scale * p, s, 1.0)
        if dp is not None:
            s = jnp.full([batch], jnp.exp2(_erfinv(dp * 2 - 1) * cfg.scale_std))
        G_inv = G_inv @ scale2d_inv(s, s, (batch,))

    # P(pre OR post rotation) = rotate * p (augment.py:301).
    p_rot = 1 - jnp.sqrt(jnp.clip(1 - cfg.rotate * p, 0, 1))
    if cfg.rotate > 0:
        geometric = True
        theta = (rand([batch]) * 2 - 1) * np.pi * cfg.rotate_max
        theta = jnp.where(rand([batch]) < p_rot, theta, 0.0)
        if dp is not None:
            theta = jnp.full([batch], (dp * 2 - 1) * np.pi * cfg.rotate_max)
        G_inv = G_inv @ rotate2d_inv(-theta, (batch,))

    if cfg.aniso > 0:
        geometric = True
        s = jnp.exp2(randn([batch]) * cfg.aniso_std)
        s = jnp.where(rand([batch]) < cfg.aniso * p, s, 1.0)
        if dp is not None:
            s = jnp.full([batch], jnp.exp2(_erfinv(dp * 2 - 1) * cfg.aniso_std))
        G_inv = G_inv @ scale2d_inv(s, 1 / s, (batch,))

    if cfg.rotate > 0:
        theta = (rand([batch]) * 2 - 1) * np.pi * cfg.rotate_max
        theta = jnp.where(rand([batch]) < p_rot, theta, 0.0)
        if dp is not None:
            theta = jnp.zeros([batch])
        G_inv = G_inv @ rotate2d_inv(-theta, (batch,))

    if cfg.xfrac > 0:
        geometric = True
        t = randn([batch, 2]) * cfg.xfrac_std
        t = jnp.where(rand([batch, 1]) < cfg.xfrac * p, t, 0.0)
        if dp is not None:
            t = jnp.full([batch, 2], _erfinv(dp * 2 - 1) * cfg.xfrac_std)
        G_inv = G_inv @ translate2d_inv(t[:, 0] * width, t[:, 1] * height,
                                        (batch,))

    # ----- Execute geometric transformations (augment.py:338-370) -----
    use_fast = cfg.geom_mode == "fast" or (
        cfg.geom_mode == "auto" and isinstance(images, jax.core.Tracer))
    if geometric and use_fast:
        # jit fast path: gather-free separable warp at NATIVE resolution
        # (gagan_tpu.train.warp).  Two deliberate deviations from the
        # reference, both jit-only (the eager path below is exact):
        #   1. XLA lowers grid_sample's per-pixel gather onto the TPU
        #      scalar core (~650 ms/batch at 1024) — replaced by dense
        #      one-hot convs + a banded MXU matmul.
        #   2. The reference antialiases by upsampling 2x with a FIR,
        #      warping, then FIR-downsampling (augment.py:352-370), i.e.
        #      4x the pixels.  Our resampler instead widens its triangle
        #      kernel to max(1, |scale|) per 1D pass (area-weighted
        #      minification, torch antialias=True style), which serves
        #      the same purpose at 1x resolution.
        #   3. The reference's reflect margin is data-dependent; under
        #      jit we use a bounded static margin (jit_margin_divisor) —
        #      extreme-tail draws sample zeros beyond it where the
        #      reference would sample reflected pixels.
        from gagan_tpu.train.warp import affine_warp

        sx = min(width // cfg.jit_margin_divisor, width - 1)
        sy = min(height // cfg.jit_margin_divisor, height - 1)
        images = jnp.pad(images, ((0, 0), (0, 0), (sy, sy), (sx, sx)),
                         mode="reflect")
        G_n = (scale2d(2 / images.shape[3], 2 / images.shape[2]) @ G_inv
               @ scale2d_inv(2 / width, 2 / height))
        images = affine_warp(images, G_n[:, :2, :], height, width,
                             antialias=True)
    elif geometric:
        Hz_geom = setup_filter(_HZ_GEOM_TAPS)
        cx = (width - 1) / 2
        cy = (height - 1) / 2
        cp = jnp.asarray([[-cx, -cy, 1], [cx, -cy, 1], [cx, cy, 1],
                          [-cx, cy, 1]], dtype=jnp.float32)     # [idx, xyz]
        cp = G_inv @ cp.T                                       # [N, xyz, idx]
        Hz_pad = len(_HZ_GEOM_TAPS) // 4
        margin = jnp.transpose(cp[:, :2, :], (1, 0, 2)).reshape(2, -1)
        margin = jnp.max(jnp.concatenate([-margin, margin], axis=1), axis=1)
        margin = jnp.concatenate([margin, margin])              # [x0, y0, x1, y1]
        margin = margin + jnp.asarray([Hz_pad * 2 - cx, Hz_pad * 2 - cy] * 2)
        margin = jnp.clip(margin, 0, None)
        margin = jnp.minimum(margin, jnp.asarray(
            [width - 1, height - 1] * 2, jnp.float32))
        if isinstance(images, jax.core.Tracer):
            # geom_mode == "exact" under jit: the data-dependent margin
            # cannot become a static pad width — use its clip bound (the
            # reference's own maximum), trading memory for exactness.
            mx0 = mx1 = width - 1
            my0 = my1 = height - 1
        else:
            mx0, my0, mx1, my1 = [int(v) for v in np.ceil(np.asarray(
                jax.lax.stop_gradient(margin)))]
        images = jnp.pad(images, ((0, 0), (0, 0), (my0, my1), (mx0, mx1)),
                         mode="reflect")
        G_inv = translate2d((mx0 - mx1) / 2, (my0 - my1) / 2) @ G_inv

        images = upsample2d(images, Hz_geom, up=2)
        G_inv = (scale2d(2, 2) @ G_inv @ scale2d_inv(2, 2))
        G_inv = (translate2d(-0.5, -0.5) @ G_inv @ translate2d_inv(-0.5, -0.5))

        out_h = (height + Hz_pad * 2) * 2
        out_w = (width + Hz_pad * 2) * 2
        G_inv = (scale2d(2 / images.shape[3], 2 / images.shape[2]) @ G_inv
                 @ scale2d_inv(2 / out_w, 2 / out_h))
        images = affine_grid_sample(images, G_inv[:, :2, :], out_h, out_w)
        images = downsample2d(images, Hz_geom, down=2, padding=-Hz_pad * 2,
                              flip_filter=True)

    # ----- Color transformations (augment.py:377-444) -----
    I4 = jnp.eye(4, dtype=jnp.float32)
    C = jnp.tile(I4[None], (batch, 1, 1))
    colored = False
    v = jnp.asarray([1, 1, 1, 0], jnp.float32) / np.sqrt(3)
    vvt = jnp.outer(v, v)

    if cfg.brightness > 0:
        colored = True
        b = randn([batch]) * cfg.brightness_std
        b = jnp.where(rand([batch]) < cfg.brightness * p, b, 0.0)
        if dp is not None:
            b = jnp.full([batch], _erfinv(dp * 2 - 1) * cfg.brightness_std)
        C = translate3d(b, b, b, (batch,)) @ C

    if cfg.contrast > 0:
        colored = True
        c = jnp.exp2(randn([batch]) * cfg.contrast_std)
        c = jnp.where(rand([batch]) < cfg.contrast * p, c, 1.0)
        if dp is not None:
            c = jnp.full([batch], jnp.exp2(_erfinv(dp * 2 - 1) * cfg.contrast_std))
        C = scale3d(c, c, c, (batch,)) @ C

    if cfg.lumaflip > 0:
        colored = True
        i = jnp.floor(rand([batch, 1, 1]) * 2)
        i = jnp.where(rand([batch, 1, 1]) < cfg.lumaflip * p, i, 0.0)
        if dp is not None:
            i = jnp.full([batch, 1, 1], jnp.floor(dp * 2))
        C = (I4 - 2 * vvt * i) @ C

    if cfg.hue > 0 and channels > 1:
        colored = True
        theta = (rand([batch]) * 2 - 1) * np.pi * cfg.hue_max
        theta = jnp.where(rand([batch]) < cfg.hue * p, theta, 0.0)
        if dp is not None:
            theta = jnp.full([batch], (dp * 2 - 1) * np.pi * cfg.hue_max)
        C = rotate3d(v, theta, (batch,)) @ C

    if cfg.saturation > 0 and channels > 1:
        colored = True
        s = jnp.exp2(randn([batch, 1, 1]) * cfg.saturation_std)
        s = jnp.where(rand([batch, 1, 1]) < cfg.saturation * p, s, 1.0)
        if dp is not None:
            s = jnp.full([batch, 1, 1],
                         jnp.exp2(_erfinv(dp * 2 - 1) * cfg.saturation_std))
        C = (vvt + (I4 - vvt) * s) @ C

    if colored:
        C = C.astype(images.dtype)
        flat = images.reshape(batch, channels, height * width)
        if channels == 3:
            flat = C[:, :3, :3] @ flat + C[:, :3, 3:]
        elif channels == 1:
            Cm = jnp.mean(C[:, :3, :], axis=1, keepdims=True)
            flat = flat * jnp.sum(Cm[:, :, :3], axis=2, keepdims=True) \
                + Cm[:, :, 3:]
        else:
            raise ValueError("images must have 1 or 3 channels")
        images = flat.reshape(batch, channels, height, width)

    # ----- Image-space filtering (augment.py:450-485) -----
    if cfg.imgfilter > 0:
        num_bands = _HZ_FBANK.shape[0]
        assert len(cfg.imgfilter_bands) == num_bands
        expected_power = jnp.asarray(np.array([10, 1, 1, 1]) / 13, jnp.float32)
        g = jnp.ones([batch, num_bands])
        for i, band_strength in enumerate(cfg.imgfilter_bands):
            t_i = jnp.exp2(randn([batch]) * cfg.imgfilter_std)
            t_i = jnp.where(rand([batch]) < cfg.imgfilter * p * band_strength,
                            t_i, 1.0)
            if dp is not None:
                t_i = (jnp.full([batch],
                                jnp.exp2(_erfinv(dp * 2 - 1) * cfg.imgfilter_std))
                       if band_strength > 0 else jnp.ones([batch]))
            t = jnp.ones([batch, num_bands]).at[:, i].set(t_i)
            t = t / jnp.sqrt(jnp.sum(expected_power * jnp.square(t), axis=-1,
                                     keepdims=True))
            g = g * t

        Hz_prime = g @ jnp.asarray(_HZ_FBANK, jnp.float32)       # [N, taps]
        taps = Hz_prime.shape[1]
        pad = _HZ_FBANK.shape[1] // 2
        x = images.reshape(1, batch * channels, height, width)
        x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
        w = jnp.repeat(Hz_prime[:, None, :], channels, axis=1)
        w = w.reshape(batch * channels, 1, taps)
        x = jax.lax.conv_general_dilated(
            x, w[:, :, None, :], (1, 1), "VALID",
            feature_group_count=batch * channels,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST)
        x = jax.lax.conv_general_dilated(
            x, w[:, :, :, None], (1, 1), "VALID",
            feature_group_count=batch * channels,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST)
        images = x.reshape(batch, channels, height, width)

    # ----- Image-space corruptions (augment.py:492-518) -----
    if cfg.noise > 0:
        sigma = jnp.abs(randn([batch, 1, 1, 1])) * cfg.noise_std
        sigma = jnp.where(rand([batch, 1, 1, 1]) < cfg.noise * p, sigma, 0.0)
        if dp is not None:
            sigma = jnp.full([batch, 1, 1, 1], _erfinv(dp) * cfg.noise_std)
        images = images + randn([batch, channels, height, width]) * sigma

    if cfg.cutout > 0:
        size = jnp.full([batch, 2, 1, 1, 1], cfg.cutout_size)
        size = jnp.where(rand([batch, 1, 1, 1, 1]) < cfg.cutout * p, size, 0.0)
        center = rand([batch, 2, 1, 1, 1])
        if dp is not None:
            size = jnp.full([batch, 2, 1, 1, 1], cfg.cutout_size)
            center = jnp.full([batch, 2, 1, 1, 1], dp)
        coord_x = jnp.arange(width).reshape(1, 1, 1, -1)
        coord_y = jnp.arange(height).reshape(1, 1, -1, 1)
        mask_x = (jnp.abs((coord_x + 0.5) / width - center[:, 0]) >=
                  size[:, 0] / 2)
        mask_y = (jnp.abs((coord_y + 0.5) / height - center[:, 1]) >=
                  size[:, 1] / 2)
        mask = jnp.logical_or(mask_x, mask_y).astype(images.dtype)
        images = images * mask

    return images.astype(in_dtype)


def make_augment_fn(cfg: AugmentConfig):
    """Adapter to the trainer's AugmentFn signature (img, p, key) -> img."""

    def fn(images, p, key):
        return augment_pipe(cfg, images, p, key)

    return fn
