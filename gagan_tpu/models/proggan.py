"""Progressive-growing GAN generator (karras ProgGAN, FFHQ-1024).

Port of `SimilarDomains/gan_models/ProgGAN/model.py:18-112`: PixelNorm +
(upscale-)conv + WScale + lrelu chain, 18 feature blocks + 1x1 RGB output.
Parameter naming mirrors the torch state_dict (features.N.conv.weight,
features.N.wscale.{scale,b}, output.conv.weight, output.wscale.*).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# (upscale, in, out, kernel, padding) per block (model.py:77-96).
BLOCKS = [
    (False, 512, 512, 4, 3), (False, 512, 512, 3, 1),
    (True, 512, 512, 3, 1), (False, 512, 512, 3, 1),
    (True, 512, 512, 3, 1), (False, 512, 512, 3, 1),
    (True, 512, 512, 3, 1), (False, 512, 512, 3, 1),
    (True, 512, 256, 3, 1), (False, 256, 256, 3, 1),
    (True, 256, 128, 3, 1), (False, 128, 128, 3, 1),
    (True, 128, 64, 3, 1), (False, 64, 64, 3, 1),
    (True, 64, 32, 3, 1), (False, 32, 32, 3, 1),
    (True, 32, 16, 3, 1), (False, 16, 16, 3, 1),
]


def pixel_norm(x, eps: float = 1e-8):
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=1,
                                      keepdims=True) + eps)


def _conv(x, w, padding):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _wscale(p, x):
    return x * p["scale"] + p["b"][None, :, None, None]


def _upsample2(x):
    n, c, h, w = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None], (n, c, h, 2, w, 2))
    return x.reshape(n, c, h * 2, w * 2)


def proggan_apply(params: Params, z: jax.Array) -> jax.Array:
    """z: [N, 512] or [N, 512, 1, 1] -> image [N, 3, 1024, 1024]."""
    x = z.reshape(z.shape[0], 512, 1, 1)
    for i, (up, _ci, _co, _k, pad) in enumerate(BLOCKS):
        p = params["features"][str(i)]
        x = pixel_norm(x)
        if up:
            x = _upsample2(x)
        x = _conv(x, p["conv"]["weight"], pad)
        x = _wscale(p["wscale"], x)
        x = jnp.where(x >= 0, x, 0.2 * x)
    p = params["output"]
    x = pixel_norm(x)
    x = _conv(x, p["conv"]["weight"], 0)
    return _wscale(p["wscale"], x)


def init_proggan(key) -> Params:
    params: Params = {"features": {}}
    for i, (_up, ci, co, k, _pad) in enumerate(BLOCKS):
        kk = jax.random.fold_in(key, i)
        params["features"][str(i)] = {
            "conv": {"weight": jax.random.normal(kk, (co, ci, k, k)) * 0.05},
            "wscale": {"scale": jnp.ones((1,)), "b": jnp.zeros((co,))},
        }
    params["output"] = {
        "conv": {"weight": jax.random.normal(
            jax.random.fold_in(key, 99), (3, 16, 1, 1)) * 0.05},
        "wscale": {"scale": jnp.ones((1,)), "b": jnp.zeros((3,))},
    }
    return params
