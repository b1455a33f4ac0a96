"""Matmul-form separable image resize for TPU.

``jax.image.resize`` already lowers linear/cubic resampling to an einsum,
but (a) it contracts at ``Precision.HIGHEST`` unconditionally (6-pass fp32
on the MXU — 6x the bf16 rate), (b) it re-derives the weight matrices
inside the traced graph every call, and (c) it emits ONE 4-operand einsum
whose contraction order is left to the backend.  For the adaptation hot
path (1024->224 CLIP preprocessing inside the loss, differentiated every
step — ``SimilarDomains/trainers.py`` clip_encode_image) we want the
separable two-matmul form with host-precomputed constant weights and a
caller-chosen precision.

``cubic_weight_matrix``/``triangle_weight_matrix`` are numpy ports of
``jax.image``'s ``compute_weight_mat`` (jax/_src/image/scale.py:54-86) with
the Keys cubic / triangle kernels, so ``resize2d(..., precision='highest')``
matches ``jax.image.resize`` to float noise (parity-tested in
tests/test_ops_parity.py).  The VJP of an einsum-with-constant is the
transposed einsum — no scatter, same cost as the forward.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _keys_cubic(x: np.ndarray) -> np.ndarray:
    """Keys (1981) cubic convolution kernel, a = -0.5
    (jax/_src/image/scale.py:40-47)."""
    out = ((1.5 * x - 2.5) * x) * x + 1.0
    out = np.where(x >= 1.0, ((-0.5 * x + 2.5) * x - 4.0) * x + 2.0, out)
    return np.where(x >= 2.0, 0.0, out)


def _triangle(x: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(x))


_KERNELS = {"bicubic": _keys_cubic, "cubic": _keys_cubic,
            "bilinear": _triangle, "linear": _triangle,
            "triangle": _triangle}


@functools.lru_cache(maxsize=64)
def weight_matrix(src: int, dst: int, method: str = "bicubic",
                  antialias: bool = True) -> np.ndarray:
    """[src, dst] float32 resampling matrix, identical to the one
    ``jax.image.resize`` builds (compute_weight_mat with scale=dst/src,
    translation=0)."""
    kernel = _KERNELS[method]
    scale = dst / src
    inv_scale = 1.0 / scale
    kernel_scale = max(inv_scale, 1.0) if antialias else 1.0
    sample_f = (np.arange(dst, dtype=np.float64) + 0.5) * inv_scale - 0.5
    x = np.abs(sample_f[None, :]
               - np.arange(src, dtype=np.float64)[:, None]) / kernel_scale
    weights = kernel(x)
    total = np.sum(weights, axis=0, keepdims=True)
    weights = np.where(np.abs(total) > 1000.0 * np.finfo(np.float32).eps,
                       weights / np.where(total != 0, total, 1), 0.0)
    weights = np.where(
        np.logical_and(sample_f >= -0.5, sample_f <= src - 0.5)[None, :],
        weights, 0.0)
    return weights.astype(np.float32)


def resize2d(x: jax.Array, out_hw: Tuple[int, int],
             method: str = "bicubic", antialias: bool = True,
             precision: Optional[str] = None) -> jax.Array:
    """NCHW (or any [..., H, W]) resize via two constant-weight matmuls.

    ``precision=None`` uses the jax default (bf16 passes on TPU — right for
    feeding bf16 towers); ``'highest'`` reproduces ``jax.image.resize``
    bit-closely.  Equal-size dims are skipped like ``jax.image.resize``.
    """
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = out_hw
    y = x
    if h != oh:
        wh = jnp.asarray(weight_matrix(h, oh, method, antialias),
                         dtype=y.dtype)
        y = jnp.einsum("...hw,hk->...kw", y, wh, precision=precision)
    if w != ow:
        ww = jnp.asarray(weight_matrix(w, ow, method, antialias),
                         dtype=y.dtype)
        y = jnp.einsum("...kw,wl->...kl", y, ww, precision=precision)
    return y
