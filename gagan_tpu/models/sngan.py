"""SN-GAN ResNet generator (anime/MNIST auxiliary models).

Port of `SimilarDomains/gan_models/SNGAN/sn_gen_resnet.py:24-113`:
dense -> 4x4 reshape -> upsampling resblocks (BN-relu-up-conv3 x2 with
upsample+1x1 shortcut) -> BN-relu-conv3-tanh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

SN_RES_GEN_CONFIGS = {
    # channels ladder per config (sn_gen_resnet.py SN_RES_GEN_CONFIGS).
    "sn_resnet128": (1024, 1024, 512, 256, 128, 64),
    "sn_resnet64": (1024, 1024, 512, 256, 128),
    "sn_resnet32": (256, 256, 256, 256),
}


@dataclasses.dataclass(frozen=True)
class SNGANConfig:
    arch: str = "sn_resnet128"
    dim_z: int = 128
    channels: int = 3
    seed_dim: int = 4

    @property
    def ladder(self) -> Tuple[int, ...]:
        return SN_RES_GEN_CONFIGS[self.arch]


def _conv(x, p, stride=1, padding=1):
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "bias" in p:
        y = y + p["bias"][None, :, None, None]
    return y


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["running_var"] + eps)
    return ((x - p["running_mean"][None, :, None, None])
            * inv[None, :, None, None] * p["weight"][None, :, None, None]
            + p["bias"][None, :, None, None])


def _up2(x):
    n, c, h, w = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None], (n, c, h, 2, w, 2))
    return x.reshape(n, c, 2 * h, 2 * w)


def _resblock(p, x):
    """(sn_gen_resnet.py:24-55): BN-relu-up-conv / BN-relu-conv + up-1x1."""
    h = jax.nn.relu(_bn(p["bn1"], x))
    h = _conv(_up2(h), p["conv1"])
    h = jax.nn.relu(_bn(p["bn2"], h))
    h = _conv(h, p["conv2"])
    sc = _conv(_up2(x), p["conv_sc"], padding=0)
    return h + sc


def sngan_apply(cfg: SNGANConfig, params: Params, z: jax.Array) -> jax.Array:
    x = z @ params["dense"]["weight"].T + params["dense"]["bias"]
    x = x.reshape(-1, cfg.ladder[0], cfg.seed_dim, cfg.seed_dim)
    for i in range(len(cfg.ladder) - 1):
        x = _resblock(params["blocks"][str(i)], x)
    x = jax.nn.relu(_bn(params["bn_out"], x))
    x = _conv(x, params["final"])
    return jnp.tanh(x)


def init_sngan(key, cfg: SNGANConfig = SNGANConfig()) -> Params:
    ks = iter(jax.random.split(key, 64))

    def conv_p(o, i, k, bias=True):
        p = {"weight": jax.random.normal(next(ks), (o, i, k, k)) * 0.05}
        if bias:
            p["bias"] = jnp.zeros((o,))
        return p

    def bn_p(n):
        return {"weight": jnp.ones((n,)), "bias": jnp.zeros((n,)),
                "running_mean": jnp.zeros((n,)), "running_var": jnp.ones((n,))}

    ladder = cfg.ladder
    params: Params = {
        "dense": {"weight": jax.random.normal(
            next(ks), (ladder[0] * cfg.seed_dim ** 2, cfg.dim_z)) * 0.05,
            "bias": jnp.zeros((ladder[0] * cfg.seed_dim ** 2,))},
        "blocks": {},
        "bn_out": bn_p(ladder[-1]),
        "final": conv_p(cfg.channels, ladder[-1], 3),
    }
    for i in range(len(ladder) - 1):
        params["blocks"][str(i)] = {
            "bn1": bn_p(ladder[i]),
            "conv1": conv_p(ladder[i + 1], ladder[i], 3),
            "bn2": bn_p(ladder[i + 1]),
            "conv2": conv_p(ladder[i + 1], ladder[i + 1], 3),
            "conv_sc": conv_p(ladder[i + 1], ladder[i], 1),
        }
    return params
