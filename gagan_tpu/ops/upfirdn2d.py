"""Pad / upsample / FIR-filter / downsample for batches of 2D images.

TPU-native re-expression of the CUDA op stack of the reference
(`DissimilarDomains/torch_utils/ops/upfirdn2d.py:130`, CUDA kernel
`upfirdn2d.cu`): the whole up->pad->FIR->down chain is a single XLA
`conv_general_dilated` per filter axis (depthwise, with input dilation for the
zero-insert upsample, negative padding for cropping, and window strides for
the downsample), so XLA fuses it with neighbouring elementwise work instead of
materialising the intermediate upsampled tensor the way the reference's
`_upfirdn2d_ref` fallback does.

Semantics match `_upfirdn2d_ref` (`upfirdn2d.py:180-219`) bit-for-bit in
float32: see tests/test_ops_parity.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

Filter = Optional[jax.Array]


def parse_scaling(scaling: Union[int, Sequence[int]]):
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def parse_padding(padding: Union[int, Sequence[int]]):
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    if len(padding) == 2:
        px, py = padding
        padding = [px, px, py, py]
    px0, px1, py0, py1 = padding
    return int(px0), int(px1), int(py0), int(py1)


def filter_size(f: Filter):
    if f is None:
        return 1, 1
    assert f.ndim in (1, 2)
    return int(f.shape[-1]), int(f.shape[0])


def setup_filter(
    f,
    normalize: bool = True,
    flip_filter: bool = False,
    gain: float = 1,
    separable: Optional[bool] = None,
) -> jax.Array:
    """Prepare a FIR filter for :func:`upfirdn2d`.

    Mirrors the conventions of the reference `setup_filter`
    (`DissimilarDomains/torch_utils/ops/upfirdn2d.py:81-125`): normalizes to
    unit DC gain, optionally flips, and scales by ``gain ** (ndim / 2)``.
    Returns a float32 array of shape [taps] (separable) or [fh, fw].
    """
    if f is None:
        f = 1
    f = jnp.asarray(f, dtype=jnp.float32)
    assert f.ndim in (0, 1, 2)
    if f.ndim == 0:
        f = f[jnp.newaxis]
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = jnp.outer(f, f)
    assert f.ndim == (1 if separable else 2)
    if normalize:
        f = f / jnp.sum(f)
    if flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2))
    return f


def _depthwise_conv(
    x: jax.Array,
    kernel: jax.Array,  # [kh, kw]
    *,
    lhs_dilation=(1, 1),
    window_strides=(1, 1),
    padding=((0, 0), (0, 0)),
) -> jax.Array:
    """Per-channel 2D correlation over NCHW input."""
    num_channels = x.shape[1]
    k = jnp.tile(kernel[jnp.newaxis, jnp.newaxis], (num_channels, 1, 1, 1))
    return jax.lax.conv_general_dilated(
        x,
        k.astype(x.dtype),
        window_strides=window_strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        feature_group_count=num_channels,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def upfirdn2d(
    x: jax.Array,
    f: Filter,
    up: Union[int, Sequence[int]] = 1,
    down: Union[int, Sequence[int]] = 1,
    padding: Union[int, Sequence[int]] = 0,
    flip_filter: bool = False,
    gain: float = 1,
) -> jax.Array:
    """Pad, upsample, FIR-filter, and downsample a batch of NCHW images.

    Performs, per channel: (1) zero-insert upsampling by ``up``; (2) zero
    padding / cropping by ``padding`` = [px0, px1, py0, py1] w.r.t. the
    upsampled image; (3) convolution with the FIR filter ``f`` (true
    convolution unless ``flip_filter``); (4) downsampling by keeping every
    ``down``-th pixel.  Matches the reference `_upfirdn2d_ref`
    (`torch_utils/ops/upfirdn2d.py:180`).
    """
    assert x.ndim == 4
    upx, upy = parse_scaling(up)
    downx, downy = parse_scaling(down)
    px0, px1, py0, py1 = parse_padding(padding)

    if f is None:
        f = jnp.ones([1, 1], dtype=jnp.float32)
    assert f.ndim in (1, 2)

    # Per-pass gain (separable applies sqrt(gain) twice).
    f = f * (gain ** (f.ndim / 2))
    f = f.astype(x.dtype)
    if not flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))

    # The reference zero-upsample appends (up - 1) zeros after *every* pixel,
    # i.e. output length H*up; XLA lhs_dilation yields (H-1)*up + 1, so the
    # trailing (up - 1) zeros fold into the high padding.
    pad_h = (py0, py1 + (upy - 1))
    pad_w = (px0, px1 + (upx - 1))

    if f.ndim == 1:
        # Separable: width pass then height pass; width ops commute with
        # height ops so each pass carries its own up/pad/down.
        x = _depthwise_conv(
            x, f[jnp.newaxis, :],
            lhs_dilation=(1, upx), window_strides=(1, downx),
            padding=((0, 0), pad_w),
        )
        x = _depthwise_conv(
            x, f[:, jnp.newaxis],
            lhs_dilation=(upy, 1), window_strides=(downy, 1),
            padding=(pad_h, (0, 0)),
        )
    else:
        x = _depthwise_conv(
            x, f,
            lhs_dilation=(upy, upx), window_strides=(downy, downx),
            padding=(pad_h, pad_w),
        )
    return x


def upsample2d(x: jax.Array, f: Filter, up: int = 2, padding: int = 0,
               flip_filter: bool = False, gain: float = 1) -> jax.Array:
    """Upsample with the given filter (reference `upsample2d`, upfirdn2d.py:321)."""
    upx, upy = parse_scaling(up)
    px0, px1, py0, py1 = parse_padding(padding)
    fw, fh = filter_size(f)
    p = [
        px0 + (fw + upx - 1) // 2,
        px1 + (fw - upx) // 2,
        py0 + (fh + upy - 1) // 2,
        py1 + (fh - upy) // 2,
    ]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter,
                     gain=gain * upx * upy)


def downsample2d(x: jax.Array, f: Filter, down: int = 2, padding: int = 0,
                 flip_filter: bool = False, gain: float = 1) -> jax.Array:
    """Downsample with the given filter (reference `downsample2d`, upfirdn2d.py:351)."""
    downx, downy = parse_scaling(down)
    px0, px1, py0, py1 = parse_padding(padding)
    fw, fh = filter_size(f)
    p = [
        px0 + (fw - downx + 1) // 2,
        px1 + (fw - downx) // 2,
        py0 + (fh - downy + 1) // 2,
        py1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)
