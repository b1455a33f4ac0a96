"""InceptionV3 (FID variant) as a pure-function JAX network.

Port of the canonical FID feature network — the TF-Slim InceptionV3 graph of
inception-2015-12-05 as re-expressed by pytorch-fid and vendored by the
reference (`SimilarDomains/core/utils/fid.py:32-370`, and the TorchScript
detector used by `DissimilarDomains/metrics/metric_utils.py:49`).  Parameter
naming mirrors the pytorch-fid state_dict (Mixed_5b.branch1x1.conv.weight,
...bn.running_mean, ...) so tools/convert_weights.py maps weights 1:1.

FID-specific patches faithfully reproduced:
  * all in-block average pools exclude zero padding from the count
    (FIDInceptionA/C/E_1, fid.py "count_include_pad=False");
  * Mixed_7c's pool branch uses MAX pooling (FIDInceptionE_2).

Outputs: `features` (2048-d pre-softmax pool), `logits` (1008-way, TF class
layout), `softmax` / `softmax_no_bias` (for Inception Score).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def _conv(x, w, stride=(1, 1), padding=((0, 0), (0, 0))):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def basic_conv2d(p: Params, x, stride=(1, 1), padding=((0, 0), (0, 0)),
                 eps: float = 1e-3):
    x = _conv(x, p["conv"]["weight"], stride, padding)
    bn = p["bn"]
    inv = jax.lax.rsqrt(bn["running_var"] + eps)
    x = (x - bn["running_mean"][None, :, None, None]) * inv[None, :, None, None]
    x = x * bn["weight"][None, :, None, None] + bn["bias"][None, :, None, None]
    return jax.nn.relu(x)


def _max_pool(x, window=3, stride=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, window, window),
        (1, 1, stride, stride), [(0, 0), (0, 0), (pad, pad), (pad, pad)])


def _avg_pool_exclude_pad(x, window=3, stride=1, pad=1):
    """Average pool that excludes zero padding from the divisor."""
    sums = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, window, window), (1, 1, stride, stride),
        [(0, 0), (0, 0), (pad, pad), (pad, pad)])
    ones = jnp.ones((1, 1) + x.shape[2:], dtype=x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 1, window, window),
        (1, 1, stride, stride), [(0, 0), (0, 0), (pad, pad), (pad, pad)])
    return sums / counts


def _inception_a(p: Params, x):
    b1 = basic_conv2d(p["branch1x1"], x)
    b5 = basic_conv2d(p["branch5x5_1"], x)
    b5 = basic_conv2d(p["branch5x5_2"], b5, padding=((2, 2), (2, 2)))
    b3 = basic_conv2d(p["branch3x3dbl_1"], x)
    b3 = basic_conv2d(p["branch3x3dbl_2"], b3, padding=((1, 1), (1, 1)))
    b3 = basic_conv2d(p["branch3x3dbl_3"], b3, padding=((1, 1), (1, 1)))
    bp = _avg_pool_exclude_pad(x)
    bp = basic_conv2d(p["branch_pool"], bp)
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def _inception_b(p: Params, x):
    b3 = basic_conv2d(p["branch3x3"], x, stride=(2, 2))
    bd = basic_conv2d(p["branch3x3dbl_1"], x)
    bd = basic_conv2d(p["branch3x3dbl_2"], bd, padding=((1, 1), (1, 1)))
    bd = basic_conv2d(p["branch3x3dbl_3"], bd, stride=(2, 2))
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=1)


def _inception_c(p: Params, x):
    b1 = basic_conv2d(p["branch1x1"], x)
    b7 = basic_conv2d(p["branch7x7_1"], x)
    b7 = basic_conv2d(p["branch7x7_2"], b7, padding=((0, 0), (3, 3)))
    b7 = basic_conv2d(p["branch7x7_3"], b7, padding=((3, 3), (0, 0)))
    bd = basic_conv2d(p["branch7x7dbl_1"], x)
    bd = basic_conv2d(p["branch7x7dbl_2"], bd, padding=((3, 3), (0, 0)))
    bd = basic_conv2d(p["branch7x7dbl_3"], bd, padding=((0, 0), (3, 3)))
    bd = basic_conv2d(p["branch7x7dbl_4"], bd, padding=((3, 3), (0, 0)))
    bd = basic_conv2d(p["branch7x7dbl_5"], bd, padding=((0, 0), (3, 3)))
    bp = _avg_pool_exclude_pad(x)
    bp = basic_conv2d(p["branch_pool"], bp)
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def _inception_d(p: Params, x):
    b3 = basic_conv2d(p["branch3x3_1"], x)
    b3 = basic_conv2d(p["branch3x3_2"], b3, stride=(2, 2))
    b7 = basic_conv2d(p["branch7x7x3_1"], x)
    b7 = basic_conv2d(p["branch7x7x3_2"], b7, padding=((0, 0), (3, 3)))
    b7 = basic_conv2d(p["branch7x7x3_3"], b7, padding=((3, 3), (0, 0)))
    b7 = basic_conv2d(p["branch7x7x3_4"], b7, stride=(2, 2))
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=1)


def _inception_e(p: Params, x, pool: str):
    b1 = basic_conv2d(p["branch1x1"], x)
    b3 = basic_conv2d(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        basic_conv2d(p["branch3x3_2a"], b3, padding=((0, 0), (1, 1))),
        basic_conv2d(p["branch3x3_2b"], b3, padding=((1, 1), (0, 0))),
    ], axis=1)
    bd = basic_conv2d(p["branch3x3dbl_1"], x)
    bd = basic_conv2d(p["branch3x3dbl_2"], bd, padding=((1, 1), (1, 1)))
    bd = jnp.concatenate([
        basic_conv2d(p["branch3x3dbl_3a"], bd, padding=((0, 0), (1, 1))),
        basic_conv2d(p["branch3x3dbl_3b"], bd, padding=((1, 1), (0, 0))),
    ], axis=1)
    if pool == "avg":
        bp = _avg_pool_exclude_pad(x)
    else:  # FIDInceptionE_2: max pool (a known bug of the original FID
        # implementation, reproduced for bit-compatibility).
        bp = _max_pool(x, stride=1, pad=1)
    bp = basic_conv2d(p["branch_pool"], bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


def inception_v3_features(params: Params, images: jax.Array,
                          resize_input: bool = True,
                          return_logits: bool = False):
    """images: uint8/float NCHW RGB in [0, 255] -> 2048-d features."""
    x = images.astype(jnp.float32)
    if x.shape[1] == 1:
        x = jnp.tile(x, (1, 3, 1, 1))
    if resize_input and x.shape[2:] != (299, 299):
        x = jax.image.resize(x, x.shape[:2] + (299, 299), method="bilinear")
    x = x / 127.5 - 1.0

    x = basic_conv2d(params["Conv2d_1a_3x3"], x, stride=(2, 2))
    x = basic_conv2d(params["Conv2d_2a_3x3"], x)
    x = basic_conv2d(params["Conv2d_2b_3x3"], x, padding=((1, 1), (1, 1)))
    x = _max_pool(x)
    x = basic_conv2d(params["Conv2d_3b_1x1"], x)
    x = basic_conv2d(params["Conv2d_4a_3x3"], x)
    x = _max_pool(x)

    x = _inception_a(params["Mixed_5b"], x)
    x = _inception_a(params["Mixed_5c"], x)
    x = _inception_a(params["Mixed_5d"], x)
    x = _inception_b(params["Mixed_6a"], x)
    x = _inception_c(params["Mixed_6b"], x)
    x = _inception_c(params["Mixed_6c"], x)
    x = _inception_c(params["Mixed_6d"], x)
    x = _inception_c(params["Mixed_6e"], x)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x, pool="avg")
    x = _inception_e(params["Mixed_7c"], x, pool="max")

    features = jnp.mean(x, axis=(2, 3))
    if not return_logits:
        return features
    logits = features @ params["fc"]["weight"].T
    logits_biased = logits + params["fc"]["bias"]
    return features, logits, logits_biased


# ----------------------------------------------------------------------------
# Initialization (random weights; real use loads a converted checkpoint).

_A_CFG = [("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64), ("Mixed_5d", 288, 64)]
_C_CFG = [("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160),
          ("Mixed_6e", 192)]


def _init_bc(key, in_ch, out_ch, kh, kw) -> Params:
    return {
        "conv": {"weight": jax.random.normal(
            key, (out_ch, in_ch, kh, kw)) * 0.05},
        "bn": {"weight": jnp.ones((out_ch,)), "bias": jnp.zeros((out_ch,)),
               "running_mean": jnp.zeros((out_ch,)),
               "running_var": jnp.ones((out_ch,))},
    }


def init_inception_v3(key) -> Params:
    k = iter(jax.random.split(key, 200))
    p: Params = {}
    p["Conv2d_1a_3x3"] = _init_bc(next(k), 3, 32, 3, 3)
    p["Conv2d_2a_3x3"] = _init_bc(next(k), 32, 32, 3, 3)
    p["Conv2d_2b_3x3"] = _init_bc(next(k), 32, 64, 3, 3)
    p["Conv2d_3b_1x1"] = _init_bc(next(k), 64, 80, 1, 1)
    p["Conv2d_4a_3x3"] = _init_bc(next(k), 80, 192, 3, 3)

    for name, in_ch, pool_ch in _A_CFG:
        p[name] = {
            "branch1x1": _init_bc(next(k), in_ch, 64, 1, 1),
            "branch5x5_1": _init_bc(next(k), in_ch, 48, 1, 1),
            "branch5x5_2": _init_bc(next(k), 48, 64, 5, 5),
            "branch3x3dbl_1": _init_bc(next(k), in_ch, 64, 1, 1),
            "branch3x3dbl_2": _init_bc(next(k), 64, 96, 3, 3),
            "branch3x3dbl_3": _init_bc(next(k), 96, 96, 3, 3),
            "branch_pool": _init_bc(next(k), in_ch, pool_ch, 1, 1),
        }
    p["Mixed_6a"] = {
        "branch3x3": _init_bc(next(k), 288, 384, 3, 3),
        "branch3x3dbl_1": _init_bc(next(k), 288, 64, 1, 1),
        "branch3x3dbl_2": _init_bc(next(k), 64, 96, 3, 3),
        "branch3x3dbl_3": _init_bc(next(k), 96, 96, 3, 3),
    }
    for name, c7 in _C_CFG:
        p[name] = {
            "branch1x1": _init_bc(next(k), 768, 192, 1, 1),
            "branch7x7_1": _init_bc(next(k), 768, c7, 1, 1),
            "branch7x7_2": _init_bc(next(k), c7, c7, 1, 7),
            "branch7x7_3": _init_bc(next(k), c7, 192, 7, 1),
            "branch7x7dbl_1": _init_bc(next(k), 768, c7, 1, 1),
            "branch7x7dbl_2": _init_bc(next(k), c7, c7, 7, 1),
            "branch7x7dbl_3": _init_bc(next(k), c7, c7, 1, 7),
            "branch7x7dbl_4": _init_bc(next(k), c7, c7, 7, 1),
            "branch7x7dbl_5": _init_bc(next(k), c7, 192, 1, 7),
            "branch_pool": _init_bc(next(k), 768, 192, 1, 1),
        }
    p["Mixed_7a"] = {
        "branch3x3_1": _init_bc(next(k), 768, 192, 1, 1),
        "branch3x3_2": _init_bc(next(k), 192, 320, 3, 3),
        "branch7x7x3_1": _init_bc(next(k), 768, 192, 1, 1),
        "branch7x7x3_2": _init_bc(next(k), 192, 192, 1, 7),
        "branch7x7x3_3": _init_bc(next(k), 192, 192, 7, 1),
        "branch7x7x3_4": _init_bc(next(k), 192, 192, 3, 3),
    }
    for name, in_ch in [("Mixed_7b", 1280), ("Mixed_7c", 2048)]:
        p[name] = {
            "branch1x1": _init_bc(next(k), in_ch, 320, 1, 1),
            "branch3x3_1": _init_bc(next(k), in_ch, 384, 1, 1),
            "branch3x3_2a": _init_bc(next(k), 384, 384, 1, 3),
            "branch3x3_2b": _init_bc(next(k), 384, 384, 3, 1),
            "branch3x3dbl_1": _init_bc(next(k), in_ch, 448, 1, 1),
            "branch3x3dbl_2": _init_bc(next(k), 448, 384, 3, 3),
            "branch3x3dbl_3a": _init_bc(next(k), 384, 384, 1, 3),
            "branch3x3dbl_3b": _init_bc(next(k), 384, 384, 3, 1),
            "branch_pool": _init_bc(next(k), in_ch, 192, 1, 1),
        }
    p["fc"] = {
        "weight": jax.random.normal(next(k), (1008, 2048)) * 0.02,
        "bias": jnp.zeros((1008,)),
    }
    return p
