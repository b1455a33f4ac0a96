"""Swin Transformer feature backbone (Swin-T default), TPU-native.

Parity target: the reference's GA feature extractor uses torchvision
``swin_t(weights=IMAGENET1K_V1).features`` (GA/feature_extraction.py:6-14).
This implementation matches the HuggingFace ``SwinModel`` semantics
(same paper math as torchvision's), so pretrained ImageNet weights
convert 1:1 from ``microsoft/swin-tiny-patch4-window7-224`` via
``params_from_hf`` — HF is in the image, torchvision is not.

TPU shape: everything is static — window partitioning is pure reshapes
and transposes, shifted windows are ``jnp.roll`` + a precomputed additive
attention mask, and the relative-position bias is a static gather from a
small table done in numpy at trace time via one-hot matmul-free take
(table is tiny; XLA constant-folds the index).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]

LN_EPS = 1e-5


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    image_size: int = 224
    patch_size: int = 4
    num_channels: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0


def swin_tiny_config() -> SwinConfig:
    return SwinConfig()


# ----------------------------------------------------------------------------
# Parameter init / conversion


def _linear(key, din, dout, bias=True):
    p = {"weight": jax.random.normal(key, (dout, din)) * 0.02}
    if bias:
        p["bias"] = jnp.zeros((dout,))
    return p


def _ln(dim):
    return {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def init_swin(key: jax.Array, cfg: SwinConfig) -> Params:
    params: Params = {
        "patch_embed": {
            "proj": {
                "weight": jax.random.normal(
                    jax.random.fold_in(key, 0),
                    (cfg.embed_dim, cfg.num_channels, cfg.patch_size,
                     cfg.patch_size)) * 0.02,
                "bias": jnp.zeros((cfg.embed_dim,)),
            },
            "norm": _ln(cfg.embed_dim),
        },
        "layers": [],
    }
    table = (2 * cfg.window_size - 1) ** 2
    for i, depth in enumerate(cfg.depths):
        dim = cfg.embed_dim * (2 ** i)
        layer = {"blocks": []}
        for b in range(depth):
            k = jax.random.fold_in(key, 1000 * (i + 1) + b)
            layer["blocks"].append({
                "norm1": _ln(dim),
                "q": _linear(jax.random.fold_in(k, 0), dim, dim),
                "k": _linear(jax.random.fold_in(k, 1), dim, dim),
                "v": _linear(jax.random.fold_in(k, 2), dim, dim),
                "proj": _linear(jax.random.fold_in(k, 3), dim, dim),
                "rel_bias": jnp.zeros((table, cfg.num_heads[i])),
                "norm2": _ln(dim),
                "fc1": _linear(jax.random.fold_in(k, 4), dim,
                               int(dim * cfg.mlp_ratio)),
                "fc2": _linear(jax.random.fold_in(k, 5),
                               int(dim * cfg.mlp_ratio), dim),
            })
        if i < len(cfg.depths) - 1:
            layer["downsample"] = {
                "norm": _ln(4 * dim),
                "reduction": _linear(jax.random.fold_in(key, 777 + i),
                                     4 * dim, 2 * dim, bias=False),
            }
        params["layers"].append(layer)
    return params


def params_from_hf(state_dict: Dict[str, np.ndarray],
                   cfg: SwinConfig) -> Params:
    """Convert a HuggingFace SwinModel state_dict (numpy arrays)."""
    g = lambda n: jnp.asarray(np.asarray(state_dict[n]))

    def lin(prefix, bias=True):
        p = {"weight": g(prefix + ".weight")}
        if bias:
            p["bias"] = g(prefix + ".bias")
        return p

    params: Params = {
        "patch_embed": {
            "proj": lin("embeddings.patch_embeddings.projection"),
            "norm": lin("embeddings.norm"),
        },
        "layers": [],
    }
    for i, depth in enumerate(cfg.depths):
        layer = {"blocks": []}
        for b in range(depth):
            pre = f"encoder.layers.{i}.blocks.{b}"
            att = f"{pre}.attention"
            layer["blocks"].append({
                "norm1": lin(f"{pre}.layernorm_before"),
                "q": lin(f"{att}.self.query"),
                "k": lin(f"{att}.self.key"),
                "v": lin(f"{att}.self.value"),
                "proj": lin(f"{att}.output.dense"),
                "rel_bias": g(f"{att}.self.relative_position_bias_table"),
                "norm2": lin(f"{pre}.layernorm_after"),
                "fc1": lin(f"{pre}.intermediate.dense"),
                "fc2": lin(f"{pre}.output.dense"),
            })
        ds = f"encoder.layers.{i}.downsample"
        if f"{ds}.reduction.weight" in state_dict:
            layer["downsample"] = {
                "norm": lin(f"{ds}.norm"),
                "reduction": lin(f"{ds}.reduction", bias=False),
            }
        params["layers"].append(layer)
    return params


# ----------------------------------------------------------------------------
# Forward


def _layer_norm(p, x):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + LN_EPS) * p["weight"] + p["bias"]


def _dense(p, x):
    y = x @ p["weight"].T
    if "bias" in p:
        y = y + p["bias"]
    return y


def _rel_position_index(window: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return rel[..., 0] * (2 * window - 1) + rel[..., 1]   # [ws*ws, ws*ws]


def _window_partition(x: jax.Array, ws: int) -> jax.Array:
    n, h, w, c = x.shape
    x = x.reshape(n, h // ws, ws, w // ws, ws, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws * ws, c)


def _window_reverse(x: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    n = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(n, h // ws, w // ws, ws, ws, -1)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(n, h, w, -1)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Additive mask [num_windows, ws*ws, ws*ws] for shifted windows
    (0 within a region, -100 across regions — HF's convention)."""
    img = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    mw = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    mw = mw.reshape(-1, ws * ws)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _block(p, x, h, w, heads, ws, shift):
    n, _, c = x.shape
    shortcut = x
    x = _layer_norm(p["norm1"], x).reshape(n, h, w, c)

    pad_b = (ws - h % ws) % ws
    pad_r = (ws - w % ws) % ws
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    hp, wp = h + pad_b, w + pad_r

    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    xw = _window_partition(x, ws)                         # [B*nw, ws*ws, C]

    head_dim = c // heads
    tokens = ws * ws

    def split(t):
        return jnp.transpose(t.reshape(-1, tokens, heads, head_dim),
                             (0, 2, 1, 3))

    q = split(_dense(p["q"], xw)) / np.sqrt(head_dim)
    k = split(_dense(p["k"], xw))
    v = split(_dense(p["v"], xw))
    attn = jnp.einsum("bhts,bhus->bhtu", q, k)

    idx = _rel_position_index(ws).reshape(-1)
    bias = p["rel_bias"][idx].reshape(tokens, tokens, heads)
    attn = attn + jnp.transpose(bias, (2, 0, 1))[None]

    if shift > 0:
        mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
        nw = mask.shape[0]
        attn = attn.reshape(-1, nw, heads, tokens, tokens) \
            + mask[None, :, None]
        attn = attn.reshape(-1, heads, tokens, tokens)

    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhtu,bhus->bhts", attn, v)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(-1, tokens, c)
    out = _dense(p["proj"], out)

    x = _window_reverse(out, ws, hp, wp)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    if pad_b or pad_r:
        x = x[:, :h, :w]
    x = shortcut + x.reshape(n, h * w, c)

    y = _layer_norm(p["norm2"], x)
    y = _dense(p["fc2"], jax.nn.gelu(_dense(p["fc1"], y), approximate=False))
    return x + y


def _patch_merge(p, x, h, w):
    n, _, c = x.shape
    x = x.reshape(n, h, w, c)
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    h2, w2 = x.shape[1], x.shape[2]
    x = x.reshape(n, h2 * w2, 4 * c)
    x = _layer_norm(p["norm"], x)
    return _dense(p["reduction"], x), h2, w2


def swin_features(cfg: SwinConfig, params: Params,
                  images: jax.Array) -> jax.Array:
    """Backbone features: images [N, 3, H, W] → [N, H', W', C'] (the
    torchvision ``.features`` output the GA extractor consumes)."""
    n = images.shape[0]
    x = jax.lax.conv_general_dilated(
        images, params["patch_embed"]["proj"]["weight"],
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = x + params["patch_embed"]["proj"]["bias"][None, :, None, None]
    h, w = x.shape[2], x.shape[3]
    x = jnp.transpose(x, (0, 2, 3, 1)).reshape(n, h * w, -1)
    x = _layer_norm(params["patch_embed"]["norm"], x)

    for i, layer in enumerate(params["layers"]):
        ws = min(cfg.window_size, h, w)
        for b, block in enumerate(layer["blocks"]):
            shift = 0 if b % 2 == 0 else (ws // 2 if min(h, w) > ws else 0)
            x = _block(block, x, h, w, cfg.num_heads[i], ws, shift)
        if "downsample" in layer:
            x, h, w = _patch_merge(layer["downsample"], x, h, w)

    return x.reshape(n, h, w, x.shape[-1])


def make_feature_extractor(cfg: Optional[SwinConfig] = None,
                           params: Optional[Params] = None,
                           key: Optional[jax.Array] = None):
    """GA-compatible feature fn: [N, 3, H, W] in [-1, 1] → [N, D]
    (GA/feature_extraction.py:6-14: per-image backbone features, flattened).
    ImageNet normalization is applied as torchvision transforms would."""
    cfg = cfg or swin_tiny_config()
    if params is None:
        params = init_swin(key if key is not None else jax.random.PRNGKey(0),
                           cfg)
    mean = jnp.asarray([0.485, 0.456, 0.406])[None, :, None, None]
    std = jnp.asarray([0.229, 0.224, 0.225])[None, :, None, None]

    @jax.jit
    def extract(images: jax.Array) -> jax.Array:
        x = (images + 1.0) / 2.0
        x = (x - mean) / std
        feats = swin_features(cfg, params, x)
        return feats.mean(axis=(1, 2))   # pooled descriptor per image

    return extract
