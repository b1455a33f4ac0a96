"""BigGAN class-conditional generator.

Port of `SimilarDomains/gan_models/BigGAN/BigGAN.py:72-301` +
`layers.py:192-520`: shared class embedding, hierarchical z chunks,
GBlocks with class-conditional batchnorm, self-attention, BN-relu-conv-tanh
output.  Spectral normalization is baked into the converted weights offline
(at inference SN is just W / sigma; tools/convert_weights power-iterates to
convergence during conversion), so every conv here is a plain convolution.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def g_arch(ch: int, resolution: int, attention: int = 64):
    """(BigGAN.py:15-69)"""
    table = {
        512: ([16, 16, 8, 8, 4, 2, 1], [16, 8, 8, 4, 2, 1, 1]),
        256: ([16, 16, 8, 8, 4, 2], [16, 8, 8, 4, 2, 1]),
        128: ([16, 16, 8, 4, 2], [16, 8, 4, 2, 1]),
        64: ([16, 16, 8, 4], [16, 8, 4, 2]),
        32: ([4, 4, 4], [4, 4, 4]),
    }
    ins, outs = table[resolution]
    res_per_block = [2 ** (i + 3) for i in range(len(ins))]
    return {
        "in_channels": [ch * c for c in ins],
        "out_channels": [ch * c for c in outs],
        "resolution": res_per_block,
        "attention": {r: r == attention for r in res_per_block},
    }


@dataclasses.dataclass(frozen=True)
class BigGANConfig:
    ch: int = 64
    dim_z: int = 120
    bottom_width: int = 4
    resolution: int = 128
    n_classes: int = 1000
    shared_dim: int = 128
    hier: bool = True
    attention: int = 64

    @property
    def arch(self):
        return g_arch(self.ch, self.resolution, self.attention)

    @property
    def num_slots(self) -> int:
        return len(self.arch["in_channels"]) + 1 if self.hier else 1

    @property
    def z_chunk_size(self) -> int:
        return self.dim_z // self.num_slots if self.hier else 0


def _conv(x, p, padding=1):
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (1, 1),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "bias" in p:
        y = y + p["bias"][None, :, None, None]
    return y


def _ccbn(p, x, y, eps=1e-5):
    """Class-conditional BN with stored stats (layers.py:340-400)."""
    gain = 1.0 + (y @ p["gain"]["weight"].T)
    bias = y @ p["bias"]["weight"].T
    inv = jax.lax.rsqrt(p["stored_var"] + eps)
    xn = (x - p["stored_mean"][None, :, None, None]) * inv[None, :, None, None]
    return xn * gain[:, :, None, None] + bias[:, :, None, None]


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["stored_var"] + eps)
    return ((x - p["stored_mean"][None, :, None, None])
            * inv[None, :, None, None] * p["gain"][None, :, None, None]
            + p["bias"][None, :, None, None])


def _up2(x):
    n, c, h, w = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None], (n, c, h, 2, w, 2))
    return x.reshape(n, c, 2 * h, 2 * w)


def _gblock(p, x, y):
    """(layers.py:480-520)"""
    h = jax.nn.relu(_ccbn(p["bn1"], x, y))
    h = _up2(h)
    x = _up2(x)
    h = _conv(h, p["conv1"])
    h = jax.nn.relu(_ccbn(p["bn2"], h, y))
    h = _conv(h, p["conv2"])
    x = _conv(x, p["conv_sc"], padding=0)
    return h + x


def _max_pool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 2, 2),
                                 (1, 1, 2, 2), [(0, 0)] * 4)


def _attention(p, x):
    """Self-attention (layers.py:192-231)."""
    n, c, h, w = x.shape
    theta = _conv(x, p["theta"], padding=0)
    phi = _max_pool2(_conv(x, p["phi"], padding=0))
    g = _max_pool2(_conv(x, p["g"], padding=0))
    theta = theta.reshape(n, c // 8, h * w)
    phi = phi.reshape(n, c // 8, h * w // 4)
    g = g.reshape(n, c // 2, h * w // 4)
    beta = jax.nn.softmax(jnp.einsum("nct,ncs->nts", theta, phi), axis=-1)
    o = jnp.einsum("ncs,nts->nct", g, beta).reshape(n, c // 2, h, w)
    return p["gamma"] * _conv(o, p["o"], padding=0) + x


def biggan_apply(cfg: BigGANConfig, params: Params, z: jax.Array,
                 class_ids: jax.Array) -> jax.Array:
    """(BigGAN.py:280-301): z [N, dim_z], class ids [N] -> [N, 3, R, R]."""
    y = params["shared"]["weight"][class_ids]          # [N, shared_dim]
    if cfg.hier:
        chunks = jnp.split(z[:, : cfg.z_chunk_size * cfg.num_slots],
                           cfg.num_slots, axis=1)
        z0 = chunks[0]
        ys = [jnp.concatenate([y, c], axis=1) for c in chunks[1:]]
    else:
        z0 = z
        ys = [y] * len(cfg.arch["in_channels"])

    h = z0 @ params["linear"]["weight"].T + params["linear"]["bias"]
    h = h.reshape(-1, cfg.arch["in_channels"][0], cfg.bottom_width,
                  cfg.bottom_width)
    for i, res in enumerate(cfg.arch["resolution"]):
        block = params["blocks"][str(i)]
        h = _gblock(block["0"], h, ys[i])
        if cfg.arch["attention"][res]:
            h = _attention(block["1"], h)
    out = params["output_layer"]
    h = jax.nn.relu(_bn(out["0"], h))
    h = _conv(h, out["2"])
    return jnp.tanh(h)


def init_biggan(key, cfg: BigGANConfig = BigGANConfig()) -> Params:
    ks = iter(jax.random.split(key, 200))

    def conv_p(o, i, k, bias=True):
        p = {"weight": jax.random.normal(next(ks), (o, i, k, k)) * 0.02}
        if bias:
            p["bias"] = jnp.zeros((o,))
        return p

    def lin_p(o, i, bias=True):
        p = {"weight": jax.random.normal(next(ks), (o, i)) * 0.02}
        if bias:
            p["bias"] = jnp.zeros((o,))
        return p

    cond_dim = cfg.shared_dim + cfg.z_chunk_size
    arch = cfg.arch
    params: Params = {
        "shared": {"weight": jax.random.normal(
            next(ks), (cfg.n_classes, cfg.shared_dim)) * 0.02},
        "linear": lin_p(arch["in_channels"][0] * cfg.bottom_width ** 2,
                        cfg.z_chunk_size if cfg.hier else cfg.dim_z),
        "blocks": {},
    }

    def ccbn_p(n):
        return {"gain": lin_p(n, cond_dim, bias=False),
                "bias": lin_p(n, cond_dim, bias=False),
                "stored_mean": jnp.zeros((n,)),
                "stored_var": jnp.ones((n,))}

    for i, res in enumerate(arch["resolution"]):
        ci, co = arch["in_channels"][i], arch["out_channels"][i]
        block: Params = {"0": {
            "bn1": ccbn_p(ci), "conv1": conv_p(co, ci, 3),
            "bn2": ccbn_p(co), "conv2": conv_p(co, co, 3),
            "conv_sc": conv_p(co, ci, 1),
        }}
        if arch["attention"][res]:
            block["1"] = {
                "theta": conv_p(co // 8, co, 1, bias=False),
                "phi": conv_p(co // 8, co, 1, bias=False),
                "g": conv_p(co // 2, co, 1, bias=False),
                "o": conv_p(co, co // 2, 1, bias=False),
                "gamma": jnp.zeros(()),
            }
        params["blocks"][str(i)] = block
    ch_last = arch["out_channels"][-1]
    params["output_layer"] = {
        "0": {"gain": jnp.ones((ch_last,)), "bias": jnp.zeros((ch_last,)),
              "stored_mean": jnp.zeros((ch_last,)),
              "stored_var": jnp.ones((ch_last,))},
        "2": conv_p(3, ch_last, 3),
    }
    return params
