"""Image utilities: differentiable bicubic downsampling, tensor→uint8
conversion, and the paper's 16-image composition grid.

Parity targets (reference: SimilarDomains/core/utils/image_utils.py):
  - ``bicubic_downsample``  — BicubicDownSample (image_utils.py:9-80):
    separable 4*factor-tap bicubic (a=-0.5) with reflect padding,
    stride=factor per axis.  Implemented as two grouped 1-D
    ``lax.conv_general_dilated`` calls so it runs on the MXU and is
    differentiable (used inside the II2S inversion loss).
  - ``t2im`` (image_utils.py:83-101), ``resize_img`` (:104-105),
    ``construct_paper_image_grid`` (:108-134), ``crop_augmentation``
    (:137-141).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _bicubic_kernel_1d(factor: int, a: float = -0.5) -> np.ndarray:
    """4*factor-tap normalized bicubic kernel (image_utils.py:10-21)."""
    size = factor * 4
    x = (np.arange(size) - np.floor(size / 2) + 0.5) / factor
    ax = np.abs(x)
    k = np.where(
        ax <= 1.0,
        (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0,
        np.where(ax < 2.0, a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a,
                 0.0),
    ).astype(np.float32)
    return k / k.sum()


def bicubic_downsample(x: jax.Array, factor: int = 4,
                       clip_round: bool = False) -> jax.Array:
    """Anti-aliased bicubic downsample by an integer ``factor`` (NCHW).

    Matches BicubicDownSample.forward (image_utils.py:42-80): reflect
    padding of ``4*factor - factor`` split floor/ceil, vertical then
    horizontal grouped 1-D convolution with stride ``factor``.
    """
    n, c, h, w = x.shape
    k = jnp.asarray(_bicubic_kernel_1d(factor))
    size = factor * 4
    pad = size - factor
    pad_lo, pad_hi = pad // 2, pad - pad // 2

    def pass1d(img, vertical: bool):
        if vertical:
            img = jnp.pad(img, ((0, 0), (0, 0), (pad_lo, pad_hi), (0, 0)),
                          mode="reflect")
            kern = jnp.tile(k[None, None, :, None], (img.shape[1], 1, 1, 1))
            strides = (factor, 1)
        else:
            img = jnp.pad(img, ((0, 0), (0, 0), (0, 0), (pad_lo, pad_hi)),
                          mode="reflect")
            kern = jnp.tile(k[None, None, None, :], (img.shape[1], 1, 1, 1))
            strides = (1, factor)
        return jax.lax.conv_general_dilated(
            img, kern, strides, "VALID", feature_group_count=img.shape[1],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    y = pass1d(x, vertical=True)
    if clip_round:
        y = jnp.clip(jnp.round(y), 0.0, 255.0)
    y = pass1d(y, vertical=False)
    if clip_round:
        y = jnp.clip(jnp.round(y), 0.0, 255.0)
    return y


def resize_img(img: jax.Array, size: int) -> jax.Array:
    """Nearest-neighbor square resize of one CHW image (image_utils.py:104,
    ``F.interpolate`` default mode)."""
    c = img.shape[0]
    return jax.image.resize(img, (c, size, size), method="nearest")


def _resize_smaller_edge(img: jax.Array, size: int) -> jax.Array:
    """torchvision ``Resize(size)``: scale so the smaller edge == size."""
    c, h, w = img.shape
    if h <= w:
        new_h, new_w = size, max(1, round(w * size / h))
    else:
        new_h, new_w = max(1, round(h * size / w)), size
    return jax.image.resize(img, (c, new_h, new_w), method="bilinear")


def t2im(img: jax.Array, size: int = 512) -> np.ndarray:
    """[-1, 1] CHW float image → HWC uint8, smaller edge resized to ``size``
    (image_utils.py:83-101)."""
    img = _resize_smaller_edge(jnp.asarray(img, jnp.float32), size)
    arr = np.asarray(jnp.transpose(img, (1, 2, 0)))
    return np.round((np.clip(arr, -1, 1) + 1) / 2 * 255).astype(np.uint8)


def construct_paper_image_grid(img: jax.Array) -> np.ndarray:
    """16-image paper figure (image_utils.py:108-134): two full-size images,
    then 2×3 half-size, then 4×2 quarter-size columns; final height 512."""
    assert img.shape[0] >= 16, "paper grid needs a batch of 16 images"
    full = img.shape[-1]
    half, quarter = full // 2, full // 4

    base = jnp.concatenate([img[0], img[1]], axis=2)
    sub = [jnp.concatenate([resize_img(img[i + j], half) for j in range(2)],
                           axis=1) for i in range(2, 8, 2)]
    base = jnp.concatenate([base, *sub], axis=2)
    sub = [jnp.concatenate([resize_img(img[i + j], quarter) for j in range(4)],
                           axis=1) for i in range(8, 16, 4)]
    base = jnp.concatenate([base, *sub], axis=2)

    base = _resize_smaller_edge(base, 512)
    arr = np.asarray(jnp.transpose(base, (1, 2, 0)))
    return np.round((np.clip(arr, -1, 1) + 1) / 2 * 255).astype(np.uint8)


def crop_augmentation(key: jax.Array, image: jax.Array, size: int = 1024,
                      alpha: float = 0.8) -> jax.Array:
    """Random alpha-crop (image_utils.py:137-141).  Static output shape
    (``int(size*alpha)`` square), offsets drawn from ``key``."""
    max_ = int(size * (1 - alpha))
    len_ = int(size * alpha)
    x, y = jax.random.randint(key, (2,), 0, max_)
    start = [0] * (image.ndim - 2) + [x, y]
    sizes = list(image.shape[:-2]) + [len_, len_]
    return jax.lax.dynamic_slice(image, start, sizes)
