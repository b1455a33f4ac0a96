"""OpenAI CLIP in JAX: ViT image encoder + causal text transformer.

The reference loads frozen OpenAI CLIP encoders for every SimilarDomains
trainer (`SimilarDomains/core/utils/common.py:25-55`, `trainers.py:122-130`)
and reaches into intermediate ViT activations for DiFa's token loss
(`trainers.py:1095-1115`).  This implementation exposes those activations as
explicit outputs (`return_hidden` — the forward-hook replacement) instead of
mutating hook state.

Parameter naming mirrors the OpenAI CLIP state_dict
(visual.conv1.weight, visual.transformer.resblocks.N.attn.in_proj_weight, …)
so pretrained checkpoints convert mechanically (tools/convert_weights.py);
tests validate against a randomly initialized torch CLIP (transformers) with
converted weights.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gagan_tpu.ops import resize as ops_resize

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    # Vision.
    image_resolution: int = 224
    vision_layers: int = 12
    vision_width: int = 768
    vision_patch_size: int = 32
    # Text.
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    vision_heads_override: Optional[int] = None

    @property
    def vision_heads(self) -> int:
        if self.vision_heads_override is not None:
            return self.vision_heads_override
        return self.vision_width // 64

    @property
    def grid_size(self) -> int:
        return self.image_resolution // self.vision_patch_size


VIT_B_32 = CLIPConfig(vision_patch_size=32)
VIT_B_16 = CLIPConfig(vision_patch_size=16)

# CLIP preprocessing constants (OpenAI _transform).
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm(p: Params, x, eps: float = 1e-5):
    # Stats and affine in float32 regardless of compute dtype (the CLIP
    # fp16 recipe keeps LayerNorm in full precision), result back in x's.
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _attention(p: Params, x, n_heads: int, attn_mask=None):
    """Multi-head self-attention with torch MultiheadAttention params."""
    seq, batch_or_none = x.shape[0], None
    # x: [N, L, C] (batch-first here).
    n, l, c = x.shape
    dt = x.dtype
    qkv = x @ p["in_proj_weight"].T.astype(dt) + p["in_proj_bias"].astype(dt)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    head_dim = c // n_heads

    def heads(t):
        return t.reshape(n, l, n_heads, head_dim).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = (q @ k.transpose(0, 1, 3, 2)).astype(jnp.float32) / np.sqrt(
        head_dim)
    if attn_mask is not None:
        scores = scores + attn_mask
    attn = jax.nn.softmax(scores, axis=-1).astype(dt)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(n, l, c)
    return out @ p["out_proj"]["weight"].T.astype(dt) \
        + p["out_proj"]["bias"].astype(dt)


def _resblock(p: Params, x, n_heads: int, attn_mask=None):
    dt = x.dtype
    x = x + _attention(p["attn"], layer_norm(p["ln_1"], x), n_heads, attn_mask)
    y = layer_norm(p["ln_2"], x)
    y = quick_gelu(y @ p["mlp"]["c_fc"]["weight"].T.astype(dt)
                   + p["mlp"]["c_fc"]["bias"].astype(dt))
    y = y @ p["mlp"]["c_proj"]["weight"].T.astype(dt) \
        + p["mlp"]["c_proj"]["bias"].astype(dt)
    return x + y


def _transformer(p: Params, x, n_heads: int, attn_mask=None,
                 return_hidden: Sequence[int] = ()):
    hidden = {}
    for i in range(len(p["resblocks"])):
        x = _resblock(p["resblocks"][str(i)], x, n_heads, attn_mask)
        if i in return_hidden:
            hidden[i] = x
    return x, hidden


def preprocess_image(images: jax.Array, resolution: int = 224,
                     precision: str = "highest") -> jax.Array:
    """uint8/float NCHW RGB in [0,255] -> CLIP-normalized float NCHW.

    Matches the reference's differentiable preprocessing of generator output
    (resize via bicubic + normalize; trainers.py clip_encode_image path).
    The resize runs as two constant-weight matmuls (ops.resize) — the
    jax.image.resize VJP/precision form cost ~20 ms/step in the adaptation
    loop at 1024->224 batch 8.  ``precision='highest'`` keeps
    jax.image.resize numerics; the bf16 tower path passes None (one bf16
    MXU pass — the tower consumes bf16 anyway).
    """
    dt = (images.dtype if jnp.issubdtype(images.dtype, jnp.floating)
          else jnp.float32)
    x = images.astype(dt) / jnp.asarray(255.0, dt)
    if x.shape[2:] != (resolution, resolution):
        x = ops_resize.resize2d(x, (resolution, resolution),
                                method="bicubic", precision=precision)
    mean = IMAGE_MEAN.astype(dt)[None, :, None, None]
    std = IMAGE_STD.astype(dt)[None, :, None, None]
    return (x - mean) / std


def encode_image(
    cfg: CLIPConfig,
    params: Params,
    images: jax.Array,
    normalize: bool = True,
    preprocess: bool = True,
    return_hidden: Sequence[int] = (),
    dtype: Optional[Any] = None,
) -> Tuple[jax.Array, Dict[int, jax.Array]]:
    """Images -> (embedding [N, embed_dim], {layer: tokens [N, L, C]}).

    `return_hidden` layers yield the resblock output tokens with the CLS
    token removed — the reference DiFa 'token' facet hook
    (trainers.py:1057-1061).

    ``dtype`` (e.g. jnp.bfloat16) runs the tower's matmuls in that
    precision — LayerNorms, attention softmax and the returned embedding /
    tokens stay float32 (the CLIP fp16 training recipe; the MXU runs bf16
    several times faster than fp32).  None = float32 throughout (matches
    the reference's `.float()`-ed towers bitwise-closely).
    """
    v = params["visual"]
    x = images
    if preprocess:
        if dtype is not None:
            # bf16 tower: cast first and resize in one bf16 MXU pass — the
            # tower consumes bf16 immediately after, and the fp32-highest
            # resize costs 6x on the MXU for precision the tower discards.
            x = preprocess_image(x.astype(dtype), cfg.image_resolution,
                                 precision=None)
        else:
            x = preprocess_image(x, cfg.image_resolution)
    if dtype is not None:
        x = x.astype(dtype)
    # Patch embedding as extract+matmul rather than a strided conv: the
    # non-overlapping stride-p pxp conv is exactly a per-patch dot, and the
    # strided conv's input-VJP (a stride-p conv_transpose onto 3 channels)
    # lowers terribly on TPU — measured ~68 ms for ViT-B/16 at batch 8 vs
    # ~0 for the whole 12-layer transformer backward.  The matmul form is
    # MXU-shaped in both directions and lands directly in [N, L, C] layout.
    n = x.shape[0]
    p = cfg.vision_patch_size
    g = cfg.image_resolution // p
    xp = x.reshape(n, 3, g, p, g, p).transpose(0, 2, 4, 1, 3, 5)
    xp = xp.reshape(n, g * g, 3 * p * p)
    w1 = v["conv1"]["weight"].astype(x.dtype).reshape(cfg.vision_width, -1)
    x = xp @ w1.T                                              # [N, L, C]
    cls = jnp.broadcast_to(v["class_embedding"].astype(x.dtype),
                           (n, 1, cfg.vision_width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["positional_embedding"].astype(x.dtype)
    x = layer_norm(v["ln_pre"], x)
    x, hidden = _transformer(v["transformer"], x, cfg.vision_heads,
                             return_hidden=return_hidden)
    pooled = layer_norm(v["ln_post"], x[:, 0]).astype(jnp.float32)
    emb = pooled @ v["proj"].astype(jnp.float32)
    if normalize:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    # drop CLS token; tokens consumed by float32 losses
    hidden = {i: h[:, 1:].astype(jnp.float32) for i, h in hidden.items()}
    return emb, hidden


def encode_text(cfg: CLIPConfig, params: Params, tokens: jax.Array,
                normalize: bool = True) -> jax.Array:
    """Token ids [N, context_length] -> embedding [N, embed_dim]."""
    x = params["token_embedding"]["weight"][tokens]
    x = x + params["positional_embedding"]
    mask = jnp.triu(jnp.full((cfg.context_length, cfg.context_length),
                             -jnp.inf), k=1)
    x, _ = _transformer(params["transformer"], x, cfg.transformer_heads,
                        attn_mask=mask)
    x = layer_norm(params["ln_final"], x)
    eot = jnp.argmax(tokens, axis=-1)
    x = x[jnp.arange(x.shape[0]), eot]
    emb = x @ params["text_projection"]
    if normalize:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb


# ----------------------------------------------------------------------------
# Initialization (random; real use converts OpenAI/HF checkpoints).


def _init_ln(width):
    return {"weight": jnp.ones((width,)), "bias": jnp.zeros((width,))}


def _init_block(key, width):
    ks = jax.random.split(key, 4)
    s = 0.02
    return {
        "ln_1": _init_ln(width),
        "attn": {
            "in_proj_weight": jax.random.normal(ks[0], (3 * width, width)) * s,
            "in_proj_bias": jnp.zeros((3 * width,)),
            "out_proj": {
                "weight": jax.random.normal(ks[1], (width, width)) * s,
                "bias": jnp.zeros((width,)),
            },
        },
        "ln_2": _init_ln(width),
        "mlp": {
            "c_fc": {"weight": jax.random.normal(ks[2], (4 * width, width)) * s,
                     "bias": jnp.zeros((4 * width,))},
            "c_proj": {"weight": jax.random.normal(ks[3], (width, 4 * width)) * s,
                       "bias": jnp.zeros((width,))},
        },
    }


def init_clip(key, cfg: CLIPConfig = VIT_B_32) -> Params:
    kv, kt, k1, k2, k3, k4, k5 = jax.random.split(key, 7)
    vis_blocks = {str(i): _init_block(jax.random.fold_in(kv, i),
                                      cfg.vision_width)
                  for i in range(cfg.vision_layers)}
    txt_blocks = {str(i): _init_block(jax.random.fold_in(kt, i),
                                      cfg.transformer_width)
                  for i in range(cfg.transformer_layers)}
    num_patches = cfg.grid_size ** 2
    return {
        "visual": {
            "conv1": {"weight": jax.random.normal(
                k1, (cfg.vision_width, 3, cfg.vision_patch_size,
                     cfg.vision_patch_size)) * 0.02},
            "class_embedding": jax.random.normal(
                k2, (cfg.vision_width,)) * 0.02,
            "positional_embedding": jax.random.normal(
                k3, (num_patches + 1, cfg.vision_width)) * 0.01,
            "ln_pre": _init_ln(cfg.vision_width),
            "transformer": {"resblocks": vis_blocks},
            "ln_post": _init_ln(cfg.vision_width),
            "proj": jax.random.normal(
                k4, (cfg.vision_width, cfg.embed_dim)) * 0.02,
        },
        "token_embedding": {"weight": jax.random.normal(
            k5, (cfg.vocab_size, cfg.transformer_width)) * 0.02},
        "positional_embedding": jax.random.normal(
            jax.random.fold_in(key, 9), (cfg.context_length,
                                         cfg.transformer_width)) * 0.01,
        "transformer": {"resblocks": txt_blocks},
        "ln_final": _init_ln(cfg.transformer_width),
        "text_projection": jax.random.normal(
            jax.random.fold_in(key, 10),
            (cfg.transformer_width, cfg.embed_dim)) * 0.02,
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }
